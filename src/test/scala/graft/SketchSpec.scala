package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates (q38): HLL++ distinct
  * within its published error envelope, approximate percentiles within
  * the accuracy parameter's rank tolerance.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, Sf0001)
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey").as("approx")).first()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("percentile_approx within 2% of exact interpolated percentile") {
    val li = Tables.lineitem(spark, Sf0001)
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx")).first()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }
}
