package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 widening: scale-safe twins for the two operator families the
  * round-6 audit flagged as weak-at-scale — global distribution windows
  * (q44/q45's single-partition WindowExec) and engine-internal sketches
  * (q38's HLL/KLL, which no oracle can reproduce). Each twin computes
  * the same statistic with a bounded-state, shuffle-lean plan AND a
  * deterministic md5-derived construction the DuckDB oracle mirrors
  * cell-for-cell.
  */
object Extended6Queries {

  /** Distribution statistics WITHOUT a global window — the 100 TB
    * alternative to q45's `Window.orderBy(...)` (which Spark executes
    * on a single partition). Value-based semantics: per customer,
    * cume_dist = P(bal ≤ mine), percent_rank = (#rows below)/(n−1),
    * quartile = ⌈4·cume_dist⌉ — ties share a value's statistics
    * (q45's positional ntile splits ties by the c_custkey tie-break;
    * this is the CDF definition a distribution profile wants).
    *
    * Scale shape (the tx17 histogram-CDF pattern): one groupBy on the
    * balance value (domain-bounded: acctbal is cents in [-999.99,
    * 9999.99] — ≤ 1.1M distinct cells no matter how many rows), one
    * running sum over that tiny histogram, and a broadcast join back.
    * No total-order sort of the data ever happens.
    */
  private def q45bDistCdf(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))
    val hist = cust.groupBy(col("c_acctbal")).agg(count(lit(1)).as("nv"))
    // window over the HISTOGRAM (≤ value-domain cells), not the data
    val wc = Window.orderBy(col("c_acctbal"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum(col("nv")).over(wc))
      .withColumn("cum_lt", col("cum") - col("nv"))
      .select(col("c_acctbal"), col("cum"), col("cum_lt"))
    val total = cust.agg(count(lit(1)).as("total"))
    cust.join(broadcast(cum), "c_acctbal")
      .crossJoin(broadcast(total))
      .select(col("c_custkey"),
        ceil(col("cum") * 4 / col("total")).cast("int").as("quartile"),
        round(col("cum_lt") / (col("total") - 1), 6).as("pr"),
        round(col("cum") / col("total"), 6).as("cd"))
      .orderBy(col("c_custkey"))
  }

  private val q45bSql =
    """WITH hist AS (SELECT c_acctbal, count(*) AS nv FROM customer GROUP BY 1),
      |cum AS (
      |  SELECT c_acctbal,
      |    sum(nv) OVER (ORDER BY c_acctbal
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(nv) OVER (ORDER BY c_acctbal
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nv AS cum_lt
      |  FROM hist),
      |total AS (SELECT count(*) AS total FROM customer)
      |SELECT c.c_custkey,
      |  CAST(ceil(m.cum * 4 / CAST(t.total AS DOUBLE)) AS INTEGER) AS quartile,
      |  round(m.cum_lt / CAST(t.total - 1 AS DOUBLE), 6) AS pr,
      |  round(m.cum / CAST(t.total AS DOUBLE), 6) AS cd
      |FROM customer c JOIN cum m USING (c_acctbal) CROSS JOIN total t
      |ORDER BY c.c_custkey""".stripMargin

  /** Deterministic sketch gate — the cross-engine-verifiable member of
    * the approximate-aggregate family (q38's HLL++/KLL internals are
    * Spark-private, so their gate is rows-only). Two constructions,
    * both md5-derived and both reproduced cell-for-cell by the oracle:
    *
    *   - distinct l_partkey per returnflag via a k=32 MIN-HASH sketch
    *     (the KMV family): for each of 32 independent md5 hash
    *     functions, keep min(h_s(v)) — duplicates cannot change a min,
    *     so the sketch needs NO distinct pre-shuffle, and min() is
    *     map-side combined: the whole estimator is one aggregate with
    *     32 min columns. Σ of the 32 minima (exact longs, fixed
    *     summation order) estimates D̂ = k·2^48/Σm − 1 (each min/2^48
    *     ~ Beta(1,D), E = 1/(D+1)).
    *   - p50/p90 of l_extendedprice per flag via the tx17
    *     histogram-CDF: dollar-bucket counts (domain-bounded), a
    *     running sum per flag over that histogram, and the first
    *     bucket whose cumulative count crosses the target rank.
    *
    * Exact values ride along so the result documents the estimator
    * error at this SF. SketchSpec asserts the accuracy envelope.
    */
  private def q38bKmvSketch(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"), col("l_partkey"),
        col("l_extendedprice"))
    def h(seed: Int) =
      conv(substring(md5(concat_ws(":", lit(seed),
        col("l_partkey").cast("string"))), 1, 12), 16, 10).cast("long")
    val mins = li.groupBy(col("flag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        (0 until k).map(s => min(h(s)).as(s"m$s")): _*)
    val sumMin = (0 until k).map(s => col(s"m$s")).reduce(_ + _)
    val kmv = mins.select(col("flag"), col("exact_parts"),
      round(lit(k.toDouble) * lit(281474976710656.0) / sumMin - 1, 2)
        .as("kmv_parts"))
    val pr = li.select(col("flag"), floor(col("l_extendedprice")).cast("long").as("b"))
    val hist = pr.groupBy(col("flag"), col("b")).agg(count(lit(1)).as("nb"))
    val wc = Window.partitionBy(col("flag")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("nb")).over(wc))
    val tot = pr.groupBy(col("flag")).agg(count(lit(1)).as("n"))
    val quant = cum.join(tot, "flag")
      .groupBy(col("flag"))
      .agg(min(when(col("cum") >= col("n") * 0.5, col("b"))).as("p50_bucket"),
        min(when(col("cum") >= col("n") * 0.9, col("b"))).as("p90_bucket"))
    kmv.join(quant, "flag")
      .select(col("flag").as("l_returnflag"), col("exact_parts"),
        col("kmv_parts"), col("p50_bucket"), col("p90_bucket"))
      .orderBy(col("l_returnflag"))
  }

  private val q38bSql =
    """WITH seeds AS (SELECT unnest(range(0, 32)) AS seed),
      |mins AS (
      |  SELECT l_returnflag, seed,
      |    min(('0x' || substr(md5(seed || ':' || l_partkey), 1, 12))::BIGINT) AS m
      |  FROM lineitem CROSS JOIN seeds
      |  GROUP BY 1, 2),
      |kmv AS (
      |  SELECT l_returnflag,
      |    round(32.0 * 281474976710656.0 / sum(m) - 1, 2) AS kmv_parts
      |  FROM mins GROUP BY 1),
      |exact AS (
      |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
      |  FROM lineitem GROUP BY 1),
      |hist AS (
      |  SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS b,
      |    count(*) AS nb
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, b,
      |    sum(nb) OVER (PARTITION BY l_returnflag ORDER BY b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |tot AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1),
      |quant AS (
      |  SELECT c.l_returnflag,
      |    min(CASE WHEN c.cum >= t.n * 0.5 THEN c.b END) AS p50_bucket,
      |    min(CASE WHEN c.cum >= t.n * 0.9 THEN c.b END) AS p90_bucket
      |  FROM cum c JOIN tot t USING (l_returnflag)
      |  GROUP BY 1)
      |SELECT e.l_returnflag, CAST(e.exact_parts AS BIGINT) AS exact_parts,
      |  k.kmv_parts, q.p50_bucket, q.p90_bucket
      |FROM exact e JOIN kmv k USING (l_returnflag) JOIN quant q USING (l_returnflag)
      |ORDER BY e.l_returnflag""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q45b_dist_cdf", q45bDistCdf, Some(q45bSql)),
    Q("q38b_kmv_sketch", q38bKmvSketch, Some(q38bSql)),
  )
}
