package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability: `observe()` collects data-quality metrics
  * DURING the pass (accumulator-backed), so a 100 TB ETL gets row
  * counts / null rates / value bounds for free — no second scan, no
  * separate profiling job. The pattern every production pipeline
  * wires into its quality gates.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe() yields row count, null count, and bounds in one pass") {
    val obs = Observation("li_metrics")
    val li = Tables.lineitem(spark, Sf0001)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(col("l_quantity").isNull.cast("long")).as("null_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    val written = li.filter(col("l_quantity") > 0).count() // the "real" job
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] === Tables.lineitem(spark, Sf0001).count())
    assert(m("null_qty").asInstanceOf[Long] === 0L)
    assert(m("min_price").asInstanceOf[Double] <= m("max_price").asInstanceOf[Double])
    assert(written > 0)
  }

  test("observed metrics see pre-filter rows when placed before the filter") {
    import spark.implicits._
    val obs = Observation("pre_filter")
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
      .observe(obs, count(lit(1)).as("n_in"))
      .filter($"x" > 3)
    assert(df.count() === 2L)       // post-filter cardinality
    assert(obs.get("n_in") === 5L)  // the observation saw every input row
  }
}
