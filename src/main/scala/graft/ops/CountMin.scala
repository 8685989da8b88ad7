package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a re-aggregatable
  * frequency summary: d seeded hash rows × w counters, estimate =
  * min over rows of the hashed counter — always an OVERestimate, with
  * error ≤ 2N/w at probability 1 − (1/2)^d. The streaming/OLAP
  * heavy-hitters primitive the reference exposes through its sketch
  * surface, built here from plain shuffled aggregation so the counter
  * table is itself a DataFrame: mergeable across shards by summing
  * (counter tables from different corpus partitions add cell-wise),
  * persistable as parquet, and — because the hash is md5-derived —
  * bit-identical across engines and runs.
  *
  * Scale shape (100 TB): the d× row blowup happens AFTER tokenize →
  * map-side partial aggregation collapses it to ≤ d·w cells per task
  * before the (single) shuffle; the counter table is d·w rows total.
  * Estimation joins the probe set against d·w rows — a broadcast.
  */
object CountMin {

  /** Deterministic cross-engine bucket: first 48 bits of
    * md5(seed:item) mod w (the q58 reproducible-sampling idiom — the
    * 12-hex-char prefix fits a long with no sign issues).
    */
  private def bucket(seedCol: String, itemCol: String, w: Int) =
    pmod(graft.dedup.Dedup.md5Hash48(
      concat_ws(":", col(seedCol), col(itemCol))), lit(w))

  /** The sketch: one row per (seed, bucket) with its count. `items`
    * must have an `item` string column; multiplicity counts.
    */
  def counters(items: DataFrame, d: Int, w: Int): DataFrame =
    items
      .select(col("item"), explode(expr(s"sequence(0, ${d - 1})")).as("seed"))
      .withColumn("bucket", bucket("seed", "item", w))
      .groupBy(col("seed"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (distinct `item` strings) against a
    * counter table: min over the d hashed cells. Absent cells count 0
    * (possible only for items the sketch never saw).
    */
  def estimate(probes: DataFrame, counterTable: DataFrame, d: Int, w: Int): DataFrame =
    probes
      .select(col("item"), explode(expr(s"sequence(0, ${d - 1})")).as("seed"))
      .withColumn("bucket", bucket("seed", "item", w))
      .join(counterTable, Seq("seed", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
