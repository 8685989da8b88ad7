package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Catalog

/** Plan-shape gates for the round-8 wave — the SCALE.md claims made
  * executable, Plan2Spec-style.
  */
class Plan3Spec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("mx09 mega-pipeline: no cartesian anywhere in the composed DAG") {
    val plan = formatted(Catalog.queries("mx09_megapipeline")(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"),
      "the composed dedup→mix→pack plan must stay equi-join/broadcast only")
    // the contamination probe and the mixing-rate table ride as
    // broadcasts, not shuffles
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("mx10 sharding: every data window is partitioned; only the 1024-bucket histogram is global") {
    val df = Catalog.queries("mx10_shard_manifest")(spark, Sf0001)
    val plan = formatted(df)
    // formatted mode prints one "Window" node per window operator;
    // exactly one of them (the bucket-histogram CDF) has an empty
    // partition spec
    val windowSpecs = plan.linesIterator
      .filter(_.trim.startsWith("Arguments: [sum("))
      .toSeq
    val global = windowSpecs.count(!_.contains("windowspecdefinition(b#"))
    assert(windowSpecs.nonEmpty, "expected window operators in the plan")
    assert(global <= 1,
      s"only the bounded histogram window may be global, found $global of ${windowSpecs.size}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q107 rolling WAU: the day fan-out joins by equi-join, never nested-loop") {
    val plan = formatted(Catalog.queries("q107_rolling_wau")(spark, Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the 7-day containment must be an explode + equi-join, not a range join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q106 funnel: four chained equi-joins on user_id, no cartesian") {
    val plan = formatted(Catalog.queries("q106_event_funnel")(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"))
  }

  test("dq04 FK audit: the dimension edges broadcast") {
    val plan = formatted(Catalog.queries("dq04_fk_integrity")(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      "nation/region/part/supplier/customer parent sets must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
