package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces identical results to a plain join") {
    val li = Tables.lineitem(spark, Sf0001)
    val part = Tables.part(spark, Sf0001)
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    val renamedPart = part.withColumnRenamed("p_partkey", "l_partkey")
    val salted = Scale.saltedJoin(li, renamedPart, "l_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    val a = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("saltedJoin left variant keeps unmatched rows exactly once") {
    val large = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "w")
    val out = Scale.saltedJoin(large, small, "k", buckets = 4, joinType = "left")
    assert(out.count() === 3)
    assert(out.filter($"w".isNotNull).count() === 1)
  }

  test("saltedJoin rejects outer join types that would duplicate small-side rows") {
    val large = Seq((1L, "a")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Scale.saltedJoin(large, small, "k", buckets = 4, joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
  }

  test("keySkewProfile ranks heavy keys with shares summing <= 1") {
    val prof = Scale.keySkewProfile(Tables.lineitem(spark, Sf0001), "l_suppkey", 5)
      .collect()
    assert(prof.length === 5)
    val shares = prof.map(_.getDouble(2))
    assert(shares.sameElements(shares.sorted.reverse))
    assert(shares.sum <= 1.0)
  }

  test("writeBucketed makes same-key aggregation shuffle-free") {
    val path = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    Scale.writeBucketed(Tables.orders(spark, Sf0001), "graft_orders_bucketed",
      "o_custkey", 4, s"$path/orders")
    val agg = spark.table("graft_orders_bucketed")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    agg.collect()
    // bucketed scan already provides hashpartitioning(o_custkey) → the
    // aggregation needs no Exchange
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    // and the unbucketed equivalent DOES shuffle, proving the contrast
    val unbucketed = Tables.orders(spark, Sf0001)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    unbucketed.collect()
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bucketed fingerprint anti-join runs with zero Exchange (incremental dedup shape)") {
    // SCALE.md's claim, plan-asserted: bucket corpus and incoming by
    // the content fingerprint once at write time and the dd07-shaped
    // incremental anti-join needs no shuffle at read time — both scans
    // already provide hashpartitioning(fp). Broadcast is disabled so
    // the assertion proves co-partitioning, not a small-side shortcut.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val withFp = Tables.documents(spark, Sf0001)
        .select($"doc_id", graft.text.TextStats.fingerprint($"text").as("fp"))
      val path = java.nio.file.Files.createTempDirectory("graft_bucket_join_").toString
      Scale.writeBucketed(withFp.filter($"doc_id" < 400), "graft_corpus_fp",
        "fp", 4, s"$path/corpus")
      Scale.writeBucketed(withFp.filter($"doc_id" >= 400), "graft_incoming_fp",
        "fp", 4, s"$path/incoming")
      val novel = spark.table("graft_incoming_fp")
        .join(spark.table("graft_corpus_fp"), Seq("fp"), "left_anti")
      val got = novel.select($"doc_id").collect().map(_.getLong(0)).sorted
      val plan = novel.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1000))
      // and the same join answers correctly (parity with unbucketed)
      val expected = withFp.filter($"doc_id" >= 400)
        .join(withFp.filter($"doc_id" < 400), Seq("fp"), "left_anti")
        .select($"doc_id").collect().map(_.getLong(0)).sorted
      assert(got === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sortedForPruning yields requested partitioning and sorted output") {
    val df = Scale.sortedForPruning(Tables.orders(spark, Sf0001), Seq("o_orderdate"), 4)
    assert(df.rdd.getNumPartitions === 4)
    // parquet timestamps surface as TIMESTAMP_NTZ (LocalDateTime) —
    // compare via ISO strings, which sort chronologically
    val perPart = df.select($"o_orderdate".cast("string")).rdd
      .mapPartitions(it => Iterator(it.map(_.getString(0)).toSeq))
      .collect()
    perPart.foreach(p => assert(p === p.sorted, "partition not sorted"))
  }
}
