package graft

import graft.ops.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert: updates win, targets pass through, inserts append") {
    val tgt = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val upd = Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val out = Merge.mergeUpsert(tgt, upd, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0)))
  }

  test("mergeUpsert: NULL update columns do not clobber target values") {
    val tgt = Seq((1L, Option("keep"))).toDF("k", "s")
    val upd = Seq((1L, Option.empty[String])).toDF("k", "s")
    val out = Merge.mergeUpsert(tgt, upd, "k").as[(Long, Option[String])].head()
    assert(out === ((1L, Some("keep"))))
  }

  test("mergeUpsert rejects mismatched column sets") {
    val tgt = Seq((1L, "a")).toDF("k", "s")
    val upd = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Merge.mergeUpsert(tgt, upd, "k")
    }
  }

  test("snapshotDiff: presence markers beat null-valued rows") {
    // key 1: value NULL in both → unchanged (dropped), NOT added/removed
    // key 2: NULL → 5.0 → changed; key 3 removed; key 4 added with NULL value
    val v1 = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]),
      (3L, Option(3.0))).toDF("k", "v")
    val v2 = Seq((1L, Option.empty[Double]), (2L, Option(5.0)),
      (4L, Option.empty[Double])).toDF("k", "v")
    val out = Merge.snapshotDiff(v1, v2, "k", Seq("v"))
      .select($"k", $"change_type").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }
}
