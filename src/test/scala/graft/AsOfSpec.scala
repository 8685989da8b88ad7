package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("asofJoinLatest picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts(5), "p1"),
      (1L, ts(10), "p2"),
      (1L, ts(2), "p0"),  // before any right row
      (2L, ts(7), "p3"),
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(5), 50.0),  // exactly at p1's ts → inclusive match
      (1L, ts(8), 80.0),
      (2L, ts(1), 10.0),
    ).toDF("user_id", "ts", "v")
    val out = AsOf.asofJoinLatest(left, right, "user_id", "ts", "v")
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(
      "p0" -> None,        // nothing at or before 10:02
      "p1" -> Some(50.0),  // ts-equal right row wins (inclusive)
      "p2" -> Some(80.0),  // latest ≤ 10:10
      "p3" -> Some(10.0)))
  }

  test("asofJoinLatestWithin nulls matches staler than the tolerance") {
    val left = Seq(
      (1L, ts(5), "p1"),   // match at 10:05 (0 min stale) → kept
      (1L, ts(10), "p2"),  // latest match 10:08 (2 min) → kept
      (1L, ts(2), "p0"),   // no match at all → NULL
      (2L, ts(7), "p3"),   // latest match 10:01 (6 min) → too stale
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(5), 50.0),
      (1L, ts(8), 80.0),
      (2L, ts(1), 10.0),
    ).toDF("user_id", "ts", "v")
    val out = AsOf.asofJoinLatestWithin(left, right, "user_id", "ts", "v",
        toleranceMicros = 5L * 60 * 1000000)
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(
      "p0" -> None,
      "p1" -> Some(50.0),
      "p2" -> Some(80.0),
      "p3" -> None))       // 6 min > 5 min tolerance
    // left row count preserved even when everything is stale
    assert(AsOf.asofJoinLatestWithin(left, right, "user_id", "ts", "v", 0L)
      .count() === 4)
  }

  test("asofJoinNext picks the earliest right row at or after each left ts") {
    val left = Seq(
      (1L, ts(5), "p1"),   // right row exactly at 10:05 → inclusive
      (1L, ts(9), "p2"),   // latest right is 10:08 < 10:09 → no forward match
      (1L, ts(2), "p0"),   // next is 10:03
      (2L, ts(7), "p3"),   // nothing at or after 10:07 for user 2
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(5), 50.0),
      (1L, ts(8), 80.0),
      (2L, ts(1), 10.0),
    ).toDF("user_id", "ts", "v")
    val out = AsOf.asofJoinNext(left, right, "user_id", "ts", "v")
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(
      "p0" -> Some(30.0),  // earliest ≥ 10:02
      "p1" -> Some(50.0),  // ts-equal right row wins (inclusive)
      "p2" -> None,        // no right row at or after 10:09
      "p3" -> None))
  }

  test("asofJoinLatest preserves all left rows and columns") {
    val left = Seq((1L, ts(1), "only")).toDF("user_id", "ts", "tag")
    val right = Seq((9L, ts(0), 1.0)).toDF("user_id", "ts", "v")
    val out = AsOf.asofJoinLatest(left, right, "user_id", "ts", "v")
    assert(out.columns.toSet === Set("user_id", "ts", "tag", "v"))
    assert(out.count() === 1)
    assert(out.filter($"v".isNull).count() === 1) // no key match → NULL carry
  }

  test("custom AsofMergeJoinExec matches the edge-case semantics of the composition") {
    val left = Seq(
      (1L, ts(5), "p1"), (1L, ts(10), "p2"), (1L, ts(2), "p0"), (2L, ts(7), "p3"),
      (3L, ts(4), "p4"), // key with no right rows at all
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0), (1L, ts(5), 50.0), (1L, ts(8), 80.0), (2L, ts(1), 10.0),
      (4L, ts(0), 99.0), // right-only key, must not leak into key 3
    ).toDF("user_id", "ts", "v")
    val out = AsOf.asofJoinLatestExec(left, right, "user_id", "ts", "v")
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(
      "p0" -> None, "p1" -> Some(50.0), "p2" -> Some(80.0), "p3" -> Some(10.0),
      "p4" -> None))
  }

  test("custom exec equals the composition on real data and plans a merge join") {
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(round(max($"value"), 2).as("click_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val composed = AsOf.asofJoinLatest(purchases, clicks, "user_id", "ts", "click_value")
    val custom = AsOf.asofJoinLatestExec(purchases, clicks, "user_id", "ts", "click_value")
    assert(custom.schema.fieldNames.toSeq === composed.schema.fieldNames.toSeq)
    assert(custom.exceptAll(composed).isEmpty && composed.exceptAll(custom).isEmpty)
    assert(custom.queryExecution.executedPlan.toString.contains("AsofMergeJoin"),
      "expected the custom physical operator in the plan")
  }

  test("asofJoinLatest rejects a left frame that already has the value column") {
    val left = Seq((1L, ts(1), 0.0)).toDF("user_id", "ts", "v")
    val right = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoinLatest(left, right, "user_id", "ts", "v")
    }
    assert(e.getMessage.contains("already has a column named 'v'"))
  }

  test("typed SimHash aggregator equals the per-bit vote definition") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val fast = graft.dedup.Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast(1L) === fast(2L))
    assert(fast(1L) !== fast(3L))
    // independent recomputation via the explicit explode formulation
    val slow = docs
      .select($"doc_id", explode(graft.text.TextStats.tokens($"text")).as("t"))
      .select($"doc_id", graft.dedup.Dedup.md5Hash48($"t").as("h"))
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(47))).as("bit"))
      .groupBy($"doc_id", $"bit")
      .agg(sum(when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1)).as("vote"))
      .groupBy($"doc_id")
      .agg(sum(when($"vote" > 0, expr("shiftleft(1L, CAST(bit AS INT))"))
        .otherwise(0L)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }
}
