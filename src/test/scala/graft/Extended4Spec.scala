package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Extended4Queries}

/** Edge semantics for the round-4 operators: sessionization gap
  * boundaries, funnel ordering, packing arithmetic, repetition and
  * contamination fractions, and mixing-rate invariants.
  */
class Extended4Spec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap exactly at the threshold stays in-session; one past splits") {
    // user 1: events at 0, 1800s (== gap), 3600s+1us (gap 1800s+1us → split)
    val e = Seq(
      (1L, 1L, 0L),
      (1L, 2L, 1800000000L),
      (1L, 3L, 3600000001L)).toDF("user_id", "event_id", "us")
    val out = Extended4Queries.sessionize(e, gapUs = 1800000000L)
      .select($"session_seq", $"n_events").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L), (2L, 1L)))
  }

  test("sessionize: simultaneous events tie-break on event_id and never split") {
    val e = Seq((7L, 10L, 500L), (7L, 11L, 500L), (7L, 12L, 500L))
      .toDF("user_id", "event_id", "us")
    val out = Extended4Queries.sessionize(e, gapUs = 1L)
      .select($"session_seq", $"n_events", $"span_sec").as[(Long, Long, Double)]
      .collect().toSeq
    assert(out === Seq((1L, 3L, 0.0)))
  }

  test("funnel: stages only count events strictly after the previous stage") {
    // q63 semantics distilled: a click BEFORE the first view must not convert.
    val e = Seq(
      (1L, "click", 10L), (1L, "view", 20L),                     // click too early
      (2L, "view", 10L), (2L, "click", 30L), (2L, "purchase", 40L),
      (3L, "view", 10L), (3L, "click", 10L)                      // same instant: not strictly after
    ).toDF("user_id", "event_type", "us")
    val v = e.filter($"event_type" === "view").groupBy("user_id").agg(min("us").as("v_us"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"us" > $"v_us").groupBy("user_id").agg(min("us").as("c_us"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"us" > $"c_us").groupBy("user_id").agg(min("us").as("p_us"))
    assert(v.count() === 3 && c.count() === 1 && p.count() === 1)
    assert(c.select("user_id").as[Long].head() === 2L)
  }

  test("pack assignment: a doc belongs to the pack where its first token lands") {
    val docs = Seq(
      ("s", 1L, 300), ("s", 2L, 300), // doc2 starts at 300 → pack 0
      ("s", 3L, 10)                   // starts at 600 → pack 1
    ).toDF("source", "doc_id", "n_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = docs.withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("pack_id", floor(($"cum" - $"n_tokens") / lit(512)))
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(packed === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("repetition: duplicated-bigram fraction on a known string") {
    // "a b a b a" → bigrams [a b, b a, a b, b a]: 4 total, 2 distinct → 0.5
    val r = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .select($"doc_id", graft.text.TextStats.tokens($"text").as("toks"))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2)))")).as("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct($"bg").as("nd"))
      .select(round(lit(1) - $"nd" / $"n", 4)).as[Double].head()
    assert(r === 0.5)
  }

  test("contamination query flags only docs sharing a full 5-gram with the benchmark set") {
    // Catalog-level smoke on real testdata: every flagged doc is outside
    // the benchmark id range and fractions are in (0, 1].
    val out = Catalog.queries("tx08_contamination")(spark, Sf0001)
    val rows = out.select($"doc_id", $"contamination").as[(Long, Double)].collect()
    assert(rows.forall { case (id, f) => id >= 25 && f > 0.0 && f <= 1.0 })
  }

  test("mix: every source keeps at most ~min-source-count docs and the smallest keeps all") {
    val out = Catalog.queries("mx02_mix")(spark, Sf0001)
      .select($"source", $"n_total", $"n_kept").as[(String, Long, Long)].collect()
    val minTotal = out.map(_._2).min
    // hash sampling is approximate: kept counts hover around min_total
    assert(out.forall { case (_, _, kept) => kept <= (minTotal * 1.5).toLong })
    val smallest = out.minBy(_._2)
    assert(smallest._3 === smallest._2) // rate 10000/10000 keeps everything
  }
}
