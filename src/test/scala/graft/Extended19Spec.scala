package graft

import org.apache.spark.sql.functions._

/** Round-7 fifteenth wave: Benford audit identities. */
class Extended19Spec extends SparkSpec {

  test("dq03: digits 1-9, frequencies sum to 1, expectations match the law") {
    val out = queries.Catalog.queries("dq03_benford")(spark, Sf0001).collect()
    assert(out.nonEmpty && out.length <= 9)
    val obsSum = out.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-4, s"obs freqs sum to $obsSum")
    out.foreach { r =>
      val (d, cnt, benford, chi2) =
        (r.getInt(0), r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(d >= 1 && d <= 9)
      assert(cnt > 0)
      assert(math.abs(benford - math.log10(1.0 + 1.0 / d)) < 1e-6)
      assert(chi2 >= 0.0)
    }
    // the counts reconcile with the positive-price order count
    assert(out.map(_.getLong(1)).sum ==
      Tables.orders(spark, Sf0001).filter(col("o_totalprice") > 0).count())
  }
}
