package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 fifteenth wave: Benford first-digit audit — the forensic
  * member of the data-quality family (dq01 constraints, dq02 drift,
  * dq03 this): compare the first-significant-digit distribution of a
  * monetary column against Benford's law and report the divergence.
  * A synthetic uniform price generator does NOT follow Benford — the
  * gate documents that honestly (high chi2), exactly as dq02 reports
  * the stationary generator stable; on real financial data the same
  * query is the standard fabrication screen.
  */
object Extended19Queries {

  /** Per first digit (1–9): observed count and frequency vs the
    * Benford expectation log10(1 + 1/d), plus the per-digit chi-square
    * contribution. One aggregate over the scan; digit extraction is
    * floor(p / 10^floor(log10 p)) — identical double arithmetic in
    * both engines.
    */
  private def dq03Benford(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.orders(s, dir).filter(col("o_totalprice") > 0)
      .select(floor(col("o_totalprice") /
        pow(lit(10.0), floor(log10(col("o_totalprice"))))).cast("int").as("d"))
    val tot = p.agg(count(lit(1)).as("n"))
    p.groupBy(col("d")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .select(col("d"), col("cnt"),
        (floor(col("cnt") / col("n").cast("double") * 1e6 + 0.5) / 1e6)
          .as("obs_freq"),
        (floor(log10(lit(1.0) + lit(1.0) / col("d")) * 1e6 + 0.5) / 1e6)
          .as("benford_freq"))
      .withColumn("chi2_term",
        floor(pow(col("obs_freq") - col("benford_freq"), 2) /
          col("benford_freq") * 1e6 + 0.5) / 1e6)
      .orderBy(col("d"))
  }

  private val dq03Sql =
    """WITH p AS (
      |  SELECT CAST(floor(o_totalprice
      |    / pow(10.0, floor(log10(o_totalprice)))) AS INTEGER) AS d
      |  FROM orders WHERE o_totalprice > 0),
      |tot AS (SELECT count(*) AS n FROM p),
      |f AS (
      |  SELECT d, count(*) AS cnt,
      |    floor(count(*) / CAST(t.n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS obs_freq,
      |    floor(log10(1.0 + 1.0 / d) * 1e6 + 0.5) / 1e6 AS benford_freq
      |  FROM p CROSS JOIN tot t
      |  GROUP BY d, t.n)
      |SELECT d, cnt, obs_freq, benford_freq,
      |  floor(pow(obs_freq - benford_freq, 2) / benford_freq * 1e6 + 0.5) / 1e6
      |    AS chi2_term
      |FROM f
      |ORDER BY d""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dq03_benford", dq03Benford, Some(dq03Sql)),
  )
}
