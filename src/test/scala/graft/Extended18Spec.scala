package graft

import org.apache.spark.sql.functions._

/** Round-7 fourteenth wave: RFM reconciliation/code-shape and
  * association-rule identities.
  */
class Extended18Spec extends SparkSpec {

  test("q103 RFM: segments reconcile to the customer base, codes are 1-5 digits") {
    val out = queries.Catalog.queries("q103_rfm")(spark, Sf0001)
      .collect()
    assert(out.nonEmpty)
    val nCust = Tables.orders(spark, Sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(out.map(_.getLong(1)).sum == nCust)
    out.foreach { r =>
      val seg = r.getString(0)
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
      assert(r.getDouble(2) > 0) // avg monetary
      assert(r.getDouble(3) >= 1.0) // avg freq: every customer ordered
    }
  }

  test("q104 association rules: identities hold and a pair recounts exactly") {
    val out = queries.Catalog.queries("q104_market_basket")(spark, Sf0001)
      .localCheckpoint()
    assert(out.count() > 0)
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // canonical order
      assert(r.getLong(2) >= 10) // support floor
      val (c1, c2, lift) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(c1 > 0 && c1 <= 1 && c2 > 0 && c2 <= 1 && lift > 0)
    }
    // recount the first rule's support from scratch
    val first = rows.head
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), (col("l_partkey") % 50).as("item")).distinct()
    val recount = li.filter(col("item") === first.getLong(0))
      .join(li.filter(col("item") === first.getLong(1))
        .withColumnRenamed("item", "item_b"), "l_orderkey")
      .count()
    assert(recount == first.getLong(2),
      s"support recount $recount vs ${first.getLong(2)}")
  }
}
