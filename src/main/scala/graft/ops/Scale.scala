package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities for the shapes that break first at 100 TB:
  * skewed join keys and repeated co-located joins. Everything here is
  * plan-level (partitioning + key rewriting) — no data leaves the
  * executors.
  */
object Scale {

  /** Salted equi-join for skewed keys. The skewed (large) side gets a
    * uniform random salt in [0, buckets); the small side is exploded
    * ×buckets so every (key, salt) combination exists. The join then
    * distributes a hot key over `buckets` reducers instead of one.
    *
    * Use when AQE's skew-join splitting isn't enough (extreme single-key
    * skew) — AQE splits post-shuffle partitions, salting splits the KEY
    * itself. Cost: the small side is replicated ×buckets, so keep it
    * the dimension side.
    *
    * Only inner/left joins are supported: the exploded small side would
    * emit each unmatched small-side row ×buckets under right/full outer
    * semantics, so those are rejected up front.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(outer small-side rows would be duplicated ×buckets)")
    val saltedLarge = large.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Bucketed write: pre-shuffles and persists by join key so repeated
    * joins/aggregations on that key run shuffle-free (both sides read
    * co-partitioned buckets). The 100 TB answer to the reference's
    * repartition("tconst") ×4 (SURVEY.md §4.2): pay the shuffle once at
    * write time, never again.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Key-distribution profile: top-N heaviest keys with their share of
    * all rows — the diagnostic run before choosing salting/AQE-skew
    * settings.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }

  /** Range-repartition + sort within partitions for write-optimized
    * output (parquet min/max pruning on the sort key benefits every
    * downstream range scan).
    */
  def sortedForPruning(df: DataFrame, sortCols: Seq[String], partitions: Int): DataFrame =
    df.repartitionByRange(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
}
