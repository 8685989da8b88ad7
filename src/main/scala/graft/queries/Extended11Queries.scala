package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 seventh wave: dataset drift monitoring (PSI — the check a
  * training-data pipeline runs on every new drop before trusting it)
  * and mergeable KMV set-operation sketches (distinct-cardinality
  * algebra across shards without re-scanning — the Theta-sketch
  * capability, built on q38b's verified KMV construction).
  */
object Extended11Queries {

  // ---------------------------------------------------------------- dq02

  /** Population Stability Index between two time periods of the same
    * table, per feature, from Laplace-smoothed histogram fractions:
    * PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i). Everything upstream of
    * the ln is exact integer counting; bucket domains are value-
    * bounded (the tx17 argument), so the whole check is two tiny
    * aggregates per feature regardless of table size. PSI < 0.1 is
    * the conventional "stable" threshold; the synthetic generator is
    * time-stationary, so the gate's expected report is stability —
    * Extended11Spec plants a drifted frame to prove the metric moves.
    */
  private def dq02DriftPsi(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      (col("l_shipdate") >= to_date(lit("1998-01-01"))).as("recent"),
      floor(col("l_extendedprice") / 5000).cast("long").as("price_b"),
      floor(col("l_quantity") / 5).cast("long").as("qty_b"),
      round(col("l_discount") * 100, 0).cast("long").as("disc_b"))
    def psi(bucket: String, feature: String): DataFrame = {
      val hist = li.groupBy(col(bucket).as("b"))
        .agg(sum(when(col("recent"), 1L).otherwise(0L)).as("cr"),
          sum(when(!col("recent"), 1L).otherwise(0L)).as("cp"))
      // Laplace-smoothed fractions over the feature's own bucket count
      // keep empty cells finite without dropping them
      val tot = hist.agg(sum(col("cr")).as("nr"), sum(col("cp")).as("np"),
        count(lit(1)).as("nb"))
      hist.crossJoin(broadcast(tot))
        .select((((col("cr") + 1) / (col("nr") + col("nb")).cast("double")).as("p")),
          (((col("cp") + 1) / (col("np") + col("nb")).cast("double")).as("q")))
        .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi_raw"))
        .select(lit(feature).as("feature"), round(col("psi_raw"), 6).as("psi"),
          (round(col("psi_raw"), 6) < 0.1).as("stable"))
    }
    psi("price_b", "extendedprice").union(psi("qty_b", "quantity"))
      .union(psi("disc_b", "discount"))
      .orderBy(col("feature"))
  }

  private val dq02Sql = {
    def one(bucket: String, feature: String) =
      s"""SELECT '$feature' AS feature, round(psi_raw, 6) AS psi,
         |  round(psi_raw, 6) < 0.1 AS stable
         |FROM (
         |  SELECT sum((p - q) * ln(p / q)) AS psi_raw
         |  FROM (
         |    SELECT (cr + 1) / CAST(t.nr + t.nb AS DOUBLE) AS p,
         |      (cp + 1) / CAST(t.np + t.nb AS DOUBLE) AS q
         |    FROM (
         |      SELECT $bucket AS b,
         |        sum(CASE WHEN recent THEN 1 ELSE 0 END) AS cr,
         |        sum(CASE WHEN NOT recent THEN 1 ELSE 0 END) AS cp
         |      FROM li GROUP BY 1) h
         |    CROSS JOIN (
         |      SELECT sum(cr) AS nr, sum(cp) AS np, count(*) AS nb
         |      FROM (
         |        SELECT $bucket AS b,
         |          sum(CASE WHEN recent THEN 1 ELSE 0 END) AS cr,
         |          sum(CASE WHEN NOT recent THEN 1 ELSE 0 END) AS cp
         |        FROM li GROUP BY 1) h2) t))""".stripMargin
    """WITH li AS (
      |  SELECT l_shipdate >= DATE '1998-01-01' AS recent,
      |    CAST(floor(l_extendedprice / 5000) AS BIGINT) AS price_b,
      |    CAST(floor(l_quantity / 5) AS BIGINT) AS qty_b,
      |    CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_b
      |  FROM lineitem)
      |""".stripMargin +
      Seq(one("price_b", "extendedprice"), one("qty_b", "quantity"),
        one("disc_b", "discount")).mkString("", "\nUNION ALL\n", "\n") +
      "ORDER BY feature"
  }

  // ---------------------------------------------------------------- q97

  /** Mergeable KMV set algebra: per-seed md5 minima sketch the
    * distinct part sets of returnflag R and A; the UNION sketch is the
    * element-wise min of the two sketches — computed WITHOUT touching
    * the data again, which is the entire point of mergeable sketches
    * (shard → sketch → combine); intersection follows by
    * inclusion–exclusion. Exact counts ride along to document the
    * estimator error. Same Beta(1,D) estimator q38b verified:
    * D̂ = k·2^48/Σmin − 1.
    */
  private def q97KmvSetops(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag").as("flag"), col("l_partkey"))
    def h(seed: Int): Column =
      graft.dedup.Dedup.md5Hash48(
        concat_ws(":", lit(seed), col("l_partkey").cast("string")))
    val sketches = li.groupBy(col("flag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        (0 until k).map(i => min(h(i)).as(s"m$i")): _*)
    // merge = element-wise min across the two single-row sketches;
    // no further scan of lineitem happens below this line
    val mergeAggs: Seq[Column] =
      Seq(sum(when(col("flag") === "R", col("exact"))).as("exact_r"),
        sum(when(col("flag") === "A", col("exact"))).as("exact_a")) ++
        (0 until k).flatMap(i => Seq(
          min(when(col("flag") === "R", col(s"m$i"))).as(s"r$i"),
          min(when(col("flag") === "A", col(s"m$i"))).as(s"a$i"),
          min(col(s"m$i")).as(s"u$i")))
    val merged = sketches.agg(mergeAggs.head, mergeAggs.tail: _*)
    def est(prefix: String): Column = {
      val sumMin = (0 until k).map(i => col(s"$prefix$i")).reduce(_ + _)
      round(lit(k.toDouble) * lit(281474976710656.0) / sumMin - 1, 2)
    }
    val exactUnion = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("R", "A"))
      .agg(countDistinct(col("l_partkey")).as("exact_union"))
    merged.crossJoin(broadcast(exactUnion))
      .select(est("r").as("est_r"), est("a").as("est_a"),
        est("u").as("est_union"),
        round(est("r") + est("a") - est("u"), 2).as("est_intersect"),
        col("exact_r"), col("exact_a"), col("exact_union"))
  }

  private val q97Sql = {
    val k = 32
    """WITH li AS (
      |  SELECT l_returnflag AS flag, l_partkey
      |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
      |seeds AS (SELECT unnest(range(0, 32)) AS seed),
      |mins AS (
      |  SELECT flag, seed,
      |    min(('0x' || substr(md5(seed || ':' || l_partkey), 1, 12))::BIGINT) AS m
      |  FROM li CROSS JOIN seeds GROUP BY 1, 2),
      |merged AS (
      |  SELECT seed,
      |    min(CASE WHEN flag = 'R' THEN m END) AS mr,
      |    min(CASE WHEN flag = 'A' THEN m END) AS ma,
      |    min(m) AS mu
      |  FROM mins GROUP BY 1),
      |ests AS (
      |  SELECT round(32.0 * 281474976710656.0 / sum(mr) - 1, 2) AS est_r,
      |    round(32.0 * 281474976710656.0 / sum(ma) - 1, 2) AS est_a,
      |    round(32.0 * 281474976710656.0 / sum(mu) - 1, 2) AS est_union
      |  FROM merged),
      |exacts AS (
      |  SELECT
      |    count(DISTINCT CASE WHEN flag = 'R' THEN l_partkey END) AS exact_r,
      |    count(DISTINCT CASE WHEN flag = 'A' THEN l_partkey END) AS exact_a,
      |    count(DISTINCT l_partkey) AS exact_union
      |  FROM li)
      |SELECT e.est_r, e.est_a, e.est_union,
      |  round(e.est_r + e.est_a - e.est_union, 2) AS est_intersect,
      |  CAST(x.exact_r AS BIGINT) AS exact_r,
      |  CAST(x.exact_a AS BIGINT) AS exact_a,
      |  CAST(x.exact_union AS BIGINT) AS exact_union
      |FROM ests e CROSS JOIN exacts x""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("dq02_drift_psi", dq02DriftPsi, Some(dq02Sql)),
    Q("q97_kmv_setops", q97KmvSetops, Some(q97Sql)),
  )
}
