package graft

import org.apache.spark.sql.functions._

/** Round-7 scale-safe twins: q45b's histogram-CDF distribution stats
  * agree with q45's positional window semantics wherever the two are
  * defined to coincide, and its plan never windows over the raw data.
  */
class Extended6Spec extends SparkSpec {

  test("q45b cume_dist equals q45's positional cume_dist on tie-free balances") {
    // on a balance value held by exactly one customer, P(bal ≤ mine)
    // (q45b, value-based) and position/n (q45, tie-broken by custkey)
    // are the same number
    val cust = Tables.customer(spark, Sf0001)
    val uniqueBals = cust.groupBy(col("c_acctbal")).count()
      .filter(col("count") === 1).select(col("c_acctbal"))
    val q45 = queries.Catalog.queries("q45_dist_windows")(spark, Sf0001)
      .select(col("c_custkey"), col("cd").as("cd_pos"))
    val q45b = queries.Catalog.queries("q45b_dist_cdf")(spark, Sf0001)
      .select(col("c_custkey"), col("cd").as("cd_val"))
    val joined = cust.join(uniqueBals, "c_acctbal")
      .select(col("c_custkey"))
      .join(q45, "c_custkey").join(q45b, "c_custkey")
    assert(joined.count() > 0)
    val mismatches = joined.filter(abs(col("cd_pos") - col("cd_val")) > 1e-9).count()
    assert(mismatches == 0)
  }

  test("q45b plan windows over the histogram, not the customer table") {
    val plan = queries.Catalog.queries("q45b_dist_cdf")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    // the only Window node's input must be the aggregated histogram
    // (count per balance), never a full-table scan ordered globally
    val windowIdx = plan.indexOf("Window")
    assert(windowIdx >= 0)
    assert(plan.substring(windowIdx).contains("HashAggregate"),
      "Window must sit above the value histogram aggregate")
  }
}
