package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Catalog

/** Executable checks for the plan properties SCALE.md claims: filters
  * reach the parquet scans, projections prune the read schema, and
  * dimension joins broadcast. These pin the *shape* of the plan, not
  * timings — a regression here (e.g. a filter stuck above a join, a
  * scan reading every column) is a scale bug even when sf0.001 results
  * stay correct.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q59 star join: dims broadcast, order-date filter pushed, lineitem scan pruned") {
    val plan = formatted(Catalog.queries("q59_tpch_q5")(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"), "dimension joins should broadcast")
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("o_orderdate")),
      "order-date range filter should reach the orders parquet scan")
    val lineitemSchema = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_extendedprice"))
    assert(lineitemSchema.exists(l => !l.contains("l_returnflag") && !l.contains("l_quantity")),
      s"lineitem scan should read only the 4 needed columns, got: $lineitemSchema")
  }

  test("q01 pricing summary: shipdate filter pushed, partial aggregation present") {
    val plan = formatted(Catalog.queries("q01_pricing_summary")(spark, Sf0001))
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")),
      "shipdate filter should reach the lineitem scan")
    assert(plan.contains("HashAggregate"), "aggregation should be hash-based")
    // partial + final pair → map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial and final hash aggregates")
  }

  test("bucketed+sorted inputs run the custom as-of join with ZERO exchanges") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf0001)
    // the metastore is fresh per JVM but the warehouse dir persists —
    // clear both so overwrite can't trip LOCATION_ALREADY_EXISTS
    Seq("b_purchases", "b_clicks").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"/tmp/graft_warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    // one write task → one file per bucket, so the scan reports both
    // bucket partitioning AND in-bucket sort order
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .repartition(1)
      .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id", "ts")
      .saveAsTable("b_purchases")
    ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
      .repartition(1)
      .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id", "ts")
      .saveAsTable("b_clicks")
    val out = graft.ops.AsOf.asofJoinLatestExec(
      spark.table("b_purchases"), spark.table("b_clicks"),
      "user_id", "ts", "click_value")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join should be shuffle-free:\n${plan.take(2000)}")
    assert(out.count() === spark.table("b_purchases").count(),
      "as-of join must preserve every left row")
  }

  test("AsofLimitPushDown pushes LIMIT into the as-of join's probe side") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val limited = graft.ops.AsOf.asofJoinLatestExec(
      purchases, clicks, "user_id", "ts", "click_value").limit(7)
    val optimized = limited.queryExecution.optimizedPlan
    val pushed = optimized.collect {
      case j: graft.plans.AsofJoin
          if j.left.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalLimit] => j
    }
    assert(pushed.nonEmpty,
      s"expected LocalLimit pushed into AsofJoin's left child:\n$optimized")
    assert(limited.count() === 7)
  }

  test("q58 hash sample keeps sampling as a scan-adjacent filter, no shuffle") {
    val plan = formatted(Catalog.queries("q58_hash_sample")(spark, Sf0001))
    // deterministic sampling must not repartition the table: the only
    // exchange allowed is the final order-by's range partitioning
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"sampling should add no shuffles, found $exchanges exchange nodes")
  }
}
