package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shape utilities for data-quality gates: group-wise
  * outlier flagging and deterministic fixed-size per-group sampling.
  */
object Stats {

  /** Rows whose value sits ≥ `zMin` sample standard deviations from
    * their group mean. The z-score is rounded to 4 decimals BEFORE the
    * threshold compare so the flagged set is reproducible across
    * engines and partial-aggregation orders (float non-associativity
    * shifts the last bits of mean/stddev; the compare must not see
    * them).
    *
    * Scale shape: groupBy to per-group (mean, stddev) — a tiny
    * aggregate, broadcast back onto the fact scan — rather than a
    * window over the full partition, which would shuffle AND sort the
    * whole table by group and serialize each group through one task.
    * Groups with stddev 0 or a single row produce NULL z and are never
    * flagged.
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      zMin: Double): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("grp_mu"),
        stddev_samp(col(valueCol)).as("grp_sd"))
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("z",
        round((col(valueCol) - col("grp_mu")) / col("grp_sd"), 4))
      .filter(abs(col("z")) >= zMin)
      .drop("grp_mu", "grp_sd")
  }

  /** Deterministic fixed-size per-group sample: the `n` rows with the
    * smallest md5(key) per group — reproducible on any engine, run,
    * and partitioning (the q58/ml02 hash-membership idiom, here with
    * an exact per-group SIZE guarantee instead of an expected rate).
    * The price of exactness is a rank: one shuffle on the group key
    * plus a within-partition sort; for rate-based sampling with no
    * shuffle at all, use the md5-bucket filter directly.
    */
  def groupSample(df: DataFrame, groupCol: String, keyCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
      .withColumn("sample_rank", col("sample_rank").cast("int"))
  }
}
