package graft

import org.apache.spark.sql.functions._

/** Round-7 tenth wave: the ridge path — λ=0 degenerates to OLS
  * exactly, λ>0 shrinks the coefficients toward zero.
  */
class Extended14Spec extends SparkSpec {

  test("ml15 ridge: lambda 0 equals OLS; lambda 1e6 shrinks the betas") {
    val rows = queries.Catalog.queries("ml15_ridge")(spark, Sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ols = queries.Catalog.queries("ml13_ols")(spark, Sf0001).first()
    val (b0, b1, b2, r2) = rows("0")
    assert(b0 == ols.getDouble(0) && b1 == ols.getDouble(1) &&
      b2 == ols.getDouble(2) && r2 == ols.getDouble(3),
      "lambda=0 must reproduce ml13 exactly")
    val (s0, s1, s2, sr2) = rows("1e6")
    // shrinkage: penalized coefficients move toward 0, fit degrades
    assert(math.abs(s1) < math.abs(b1), s"beta_x1 $s1 not shrunk vs $b1")
    assert(math.abs(s2) < math.abs(b2) || s2 == 0.0,
      s"beta_x2 $s2 not shrunk vs $b2")
    assert(sr2 <= r2 && sr2 > 0.9, s"ridge r2 $sr2 vs ols $r2")
    assert(s0 != 0.0 || b0 == 0.0) // intercept unpenalized, stays free
  }

  test("ml16 calibration bins partition the data and reconcile with the prior") {
    val out = queries.Catalog.queries("ml16_calibration")(spark, Sf0001)
      .collect()
    val li = Tables.lineitem(spark, Sf0001)
    val total = out.map(_.getLong(1)).sum
    assert(total == li.count())
    // weighted observed rate across bins is exactly the class prior
    val prior = li.filter(col("l_returnflag") === "R").count().toDouble / total
    val wObs = out.map(r => r.getDouble(3) * r.getLong(1)).sum / total
    assert(math.abs(wObs - prior) < 1e-3, s"weighted obs $wObs vs prior $prior")
    out.foreach { r =>
      val (bin, avgPred, gap) = (r.getInt(0), r.getDouble(2), r.getDouble(4))
      assert(bin >= 0 && bin <= 9)
      // predictions in a bin average inside that bin's range
      assert(avgPred >= bin / 10.0 - 1e-9 && avgPred <= (bin + 1) / 10.0 + 1e-9)
      assert(gap >= 0.0 && gap <= 1.0)
    }
  }
}
