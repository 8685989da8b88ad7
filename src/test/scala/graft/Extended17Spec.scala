package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 thirteenth wave: SCD2 interval chaining and the
  * penny-exact proration invariant.
  */
class Extended17Spec extends SparkSpec {

  test("q101 SCD2: versions chain gaplessly and never repeat a state") {
    val out = queries.Catalog.queries("q101_scd2")(spark, Sf0001)
      .localCheckpoint()
    assert(out.count() > 0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val chained = out
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .withColumn("prev_version", lag(col("version"), 1).over(w))
    // valid_to of version k is exactly valid_from of version k+1
    assert(chained.filter(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).count() == 0)
    // the current (last) version is open-ended
    assert(chained.filter(col("next_from").isNull &&
      col("valid_to").isNotNull).count() == 0)
    // consecutive duplicates collapsed; versions are 1,2,3,...
    assert(chained.filter(col("prev_state").isNotNull &&
      col("prev_state") === col("state")).count() == 0)
    assert(chained.filter(col("prev_version").isNotNull &&
      col("version") =!= col("prev_version") + 1).count() == 0)
    assert(out.filter(col("version") === 1).count() ==
      out.select(col("user_id")).distinct().count())
  }

  test("q102 proration: every order's cents sum EXACTLY to its total") {
    val out = queries.Catalog.queries("q102_proration")(spark, Sf0001)
      .localCheckpoint()
    val totals = Tables.orders(spark, Sf0001)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("l_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("t"))
    val sums = out.groupBy(col("l_orderkey"))
      .agg(sum(col("alloc_cents")).as("s"), sum(col("price_cents")).as("tw"))
      .join(totals, "l_orderkey")
    assert(sums.count() > 0)
    // the invariant naive rounding leaks: Σ alloc == T, exactly, always
    assert(sums.filter(col("s") =!= col("t")).count() == 0)
    // fairness: each line's allocation is within 1 cent of its exact share
    val fair = out.join(sums.select(col("l_orderkey"), col("tw"), col("t")),
        "l_orderkey")
      .withColumn("exact", col("t") * col("price_cents") / col("tw"))
      .filter(abs(col("alloc_cents") - col("exact")) > 1.0)
    assert(fair.count() == 0)
  }
}
