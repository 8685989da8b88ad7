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
