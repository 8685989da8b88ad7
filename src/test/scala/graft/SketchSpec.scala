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

  test("daily HLL sketches merged via hll_union_agg estimate within 5% of exact") {
    val ev = Tables.events(spark, Sf0001)
    val daily = ev.groupBy(to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val merged = daily.agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx")).first().getLong(0)
    val exact = ev.agg(countDistinct($"user_id")).first().getLong(0)
    // merging daily partial sketches must estimate the all-time distinct
    // count as well as a single global sketch would
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"exact=$exact merged=$merged")
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
