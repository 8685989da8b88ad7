package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 tenth wave: ridge regression — the regularized counterpart
  * to ml13's closed-form OLS. Identical distributed moment
  * accumulation; the solve adds λ to the non-intercept diagonal of
  * XᵀX (standard practice: the intercept is not penalized), so the
  * same exact-integer-sums + in-plan-Cramer machinery verifies the
  * regularization path, and the known-answer target makes shrinkage
  * itself checkable: λ=0 recovers β exactly; λ>0 shrinks |β| and
  * leaves R² just under 1.
  */
object Extended14Queries {

  /** Two solves in one output row pair: λ = 0 (must equal ml13) and
    * λ = 1e6 (visible shrinkage against the ~1e9-scale moment
    * diagonal). One aggregate scan total — the sums feed both solves.
    */
  private def ml15Ridge(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice"), 0).cast("long").as("q"),
        round(col("l_discount") * 100, 0).cast("long").as("d100"))
      .select(col("q"), (col("q") * col("d100")).as("d"))
      .select(col("q"), col("d"), (col("q") * 100 - col("d")).as("y"))
    val sums = f.agg(
      count(lit(1)).as("n"), sum(col("q")).as("sq"), sum(col("d")).as("sd"),
      sum(col("q") * col("q")).as("sqq"), sum(col("q") * col("d")).as("sqd"),
      sum(col("d") * col("d")).as("sdd"), sum(col("y")).as("sy"),
      sum(col("q") * col("y")).as("sqy"), sum(col("d") * col("y")).as("sdy"),
      sum(col("y").cast("double") * col("y").cast("double")).as("syy"))
    val base = sums.selectExpr(
      "CAST(n AS DOUBLE) AS nd", "CAST(sq AS DOUBLE) AS a12",
      "CAST(sd AS DOUBLE) AS a13", "CAST(sqq AS DOUBLE) AS a22",
      "CAST(sqd AS DOUBLE) AS a23", "CAST(sdd AS DOUBLE) AS a33",
      "CAST(sy AS DOUBLE) AS r1", "CAST(sqy AS DOUBLE) AS r2",
      "CAST(sdy AS DOUBLE) AS r3", "syy")
    // both λs ride ONE scan: cross join the 1-row moments with the
    // 2-row λ table instead of unioning two copies of the aggregate
    // subtree (which would scan lineitem twice — Plan2Spec pins this)
    import s.implicits._
    val lams = Seq(("0", 0.0), ("1e6", 1e6)).toDF("lam", "lam_v")
    base.crossJoin(broadcast(lams))
      .selectExpr("*", "a22 + lam_v AS b22", "a33 + lam_v AS b33")
      .selectExpr("*",
        "nd*(b22*b33 - a23*a23) - a12*(a12*b33 - a23*a13) + a13*(a12*a23 - b22*a13) AS det")
      .selectExpr("*",
        "(r1*(b22*b33 - a23*a23) - a12*(r2*b33 - a23*r3) + a13*(r2*a23 - b22*r3)) / det AS b0",
        "(nd*(r2*b33 - a23*r3) - r1*(a12*b33 - a23*a13) + a13*(a12*r3 - r2*a13)) / det AS b1",
        "(nd*(b22*r3 - r2*a23) - a12*(a12*r3 - r2*a13) + r1*(a12*a23 - b22*a13)) / det AS b2")
      .selectExpr("lam",
        "floor(b0 * 1e6 + 0.5) / 1e6 AS beta0",
        "floor(b1 * 1e6 + 0.5) / 1e6 AS beta_x1",
        "floor(b2 * 1e6 + 0.5) / 1e6 AS beta_x2",
        "floor((1.0 - (syy - (b0*r1 + b1*r2 + b2*r3)) / (syy - r1*r1/nd)) * 1e6 + 0.5) / 1e6 AS r2")
      .orderBy(col("lam"))
  }

  private val ml15Sql = {
    def solve(lam: String, tag: String) =
      s"""SELECT '$tag' AS lam,
         |  floor(b0 * 1e6 + 0.5) / 1e6 AS beta0,
         |  floor(b1 * 1e6 + 0.5) / 1e6 AS beta_x1,
         |  floor(b2 * 1e6 + 0.5) / 1e6 AS beta_x2,
         |  floor((1.0 - (syy - (b0*r1 + b1*r2 + b2*r3)) / (syy - r1*r1/nd)) * 1e6 + 0.5) / 1e6 AS r2
         |FROM (
         |  SELECT *,
         |    (r1*(b22*b33 - a23*a23) - a12*(r2*b33 - a23*r3) + a13*(r2*a23 - b22*r3)) / det AS b0,
         |    (nd*(r2*b33 - a23*r3) - r1*(a12*b33 - a23*a13) + a13*(a12*r3 - r2*a13)) / det AS b1,
         |    (nd*(b22*r3 - r2*a23) - a12*(a12*r3 - r2*a13) + r1*(a12*a23 - b22*a13)) / det AS b2
         |  FROM (
         |    SELECT *,
         |      nd*(b22*b33 - a23*a23) - a12*(a12*b33 - a23*a13) + a13*(a12*a23 - b22*a13) AS det
         |    FROM (SELECT *, a22 + $lam AS b22, a33 + $lam AS b33 FROM c) c1) c2)""".stripMargin
    """WITH f0 AS (
      |  SELECT CAST(round(l_extendedprice, 0) AS BIGINT) AS q,
      |    CAST(round(l_discount * 100, 0) AS BIGINT) AS d100
      |  FROM lineitem),
      |f AS (SELECT q, q * d100 AS d, q * 100 - q * d100 AS y FROM f0),
      |sums AS (
      |  SELECT count(*) AS n, sum(q) AS sq, sum(d) AS sd,
      |    sum(q * q) AS sqq, sum(q * d) AS sqd, sum(d * d) AS sdd,
      |    sum(y) AS sy, sum(q * y) AS sqy, sum(d * y) AS sdy,
      |    sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy
      |  FROM f),
      |c AS (
      |  SELECT CAST(n AS DOUBLE) AS nd, CAST(sq AS DOUBLE) AS a12,
      |    CAST(sd AS DOUBLE) AS a13, CAST(sqq AS DOUBLE) AS a22,
      |    CAST(sqd AS DOUBLE) AS a23, CAST(sdd AS DOUBLE) AS a33,
      |    CAST(sy AS DOUBLE) AS r1, CAST(sqy AS DOUBLE) AS r2,
      |    CAST(sdy AS DOUBLE) AS r3, syy
      |  FROM sums)
      |""".stripMargin +
      solve("0.0", "0") + "\nUNION ALL\n" + solve("1000000.0", "1e6") +
      "\nORDER BY lam"
  }

  // ---------------------------------------------------------------- ml16

  /** Calibration (reliability) table for ml11's logistic model — the
    * third leg of the evaluation family (ml03/ml14 confusion, q94
    * lift, ml16 calibration): per predicted-probability decile bin,
    * average predicted probability vs observed positive rate and
    * their gap. Scores the IDENTICAL trained model (shared
    * [[Extended7Queries.logregWeights]] 5-step snapped GD), so the
    * oracle replays the same CTE chain ml11 verified and bins from
    * w5. One extra aggregate pass over the feature frame.
    */
  private def ml16Calibration(s: SparkSession, dir: String): DataFrame = {
    val f = Extended7Queries.logregFeatures(s, dir).persist()
    try {
      val w = Extended7Queries.logregWeights(f)
      val z = lit(w(0)) + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      f.select(col("y"), p.as("p"))
        .select(col("y"), col("p"),
          least(floor(col("p") * 10), lit(9)).cast("int").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), round(avg(col("p")), 4).as("avg_pred"),
          round(avg(col("y")), 4).as("obs_rate"))
        .withColumn("gap", round(abs(col("avg_pred") - col("obs_rate")), 4))
        .orderBy(col("bin"))
    } finally f.unpersist()
  }

  private val ml16Sql =
    Extended7Queries.logregPrefixSql + """,
      |scored AS (
      |  SELECT f.y,
      |    1.0 / (1.0 + exp(-(w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))) AS p
      |  FROM f CROSS JOIN w5 w)
      |SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS bin, count(*) AS n,
      |  round(avg(p), 4) AS avg_pred, round(avg(y), 4) AS obs_rate,
      |  round(abs(round(avg(p), 4) - round(avg(y), 4)), 4) AS gap
      |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ml15_ridge", ml15Ridge, Some(ml15Sql)),
    Q("ml16_calibration", ml16Calibration, Some(ml16Sql)),
  )
}
