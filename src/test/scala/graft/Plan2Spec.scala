package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Catalog

/** Plan-shape gates for the round-7 wave operators — the SCALE.md
  * claims made executable, PlanSpec-style: broadcast where a side is
  * provably bounded, equi-joins where a cartesian would be a scale
  * bug, and windows only over per-key or domain-bounded inputs.
  */
class Plan2Spec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q91 bloom probe joins the 2048-word filter by broadcast") {
    val plan = formatted(Catalog.queries("q91_bloom_filter")(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      "the bloom word table must broadcast to the probe side")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dd18 prefix filter: index and verify stages are equi-joins, no cartesian") {
    val plan = formatted(Catalog.queries("dd18_prefix_filter")(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"),
      "set-similarity must never degrade to all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay an equi-join on the shingle key")
  }

  test("ml17 kNN: the 20-row test side broadcasts; the corpus never does") {
    val df = Catalog.queries("ml17_knn")(spark, Sf0001)
    val plan = formatted(df)
    // the crossJoin must plan as a broadcast nested loop with the
    // BOUNDED side (test, vec_id < 20) built — never the corpus, which
    // scales with the data
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "test×corpus scoring should broadcast the bounded test side")
    assert(!plan.contains("CartesianProduct"),
      "an unhinted crossJoin at scale would shuffle the corpus")
    // the hinted test side is the LEFT input — the build side must be
    // left, i.e. the corpus (right) is streamed, never collected
    assert(plan.contains("BuildLeft"),
      "the broadcast build side must be the bounded test set")
  }

  test("ml13/ml15 closed-form solvers are single-aggregate plans (no join of the data)") {
    Seq("ml13_ols", "ml15_ridge").foreach { q =>
      val plan = formatted(Catalog.queries(q)(spark, Sf0001))
      // the moment matrix is one hash-aggregate over the scan; the
      // Cramer solve must not touch lineitem again
      // formatted mode lists each node twice (tree + details): count
      // only the "(n) Scan parquet" detail headers
      val scans = plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
      assert(scans == 1, s"$q should scan (lineitem) exactly once, got $scans")
      assert(plan.contains("HashAggregate"))
    }
  }

  test("ml14 scoring joins the likelihood table by hash, priors by broadcast") {
    val plan = formatted(Catalog.queries("ml14_naive_bayes")(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"),
      "the class fan-out is a bounded broadcast, never a cartesian over data")
  }

  test("q96 skyline: the dominance refinement never touches the full part table") {
    val out = Catalog.queries("q96_skyline")(spark, Sf0001)
    val plan = formatted(out)
    // the candidate self-join is a nested-loop by necessity (range
    // dominance predicate) but runs over the localCheckpoint'd
    // candidate RDD, not a parquet scan of part
    val scanCount = plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scanCount <= 1,
      s"dominance refinement must reuse candidates, not rescan part ($scanCount scans)")
  }

  test("q92 EWMA band join is an equi-join on user with a range residual") {
    val plan = formatted(Catalog.queries("q92_ewma")(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"),
      "the 20-row band must ride the user_id equi-join")
  }
}
