package graft

import graft.queries.Catalog

/** Round-8 fourth wave: column profiling. */
class Extended23Spec extends SparkSpec {

  test("dq07: the primary key profiles as the only candidate key") {
    val rows = Catalog.queries("dq07_key_profile")(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 6)
    val total = Tables.orders(spark, Sf0001).count()
    rows.values.foreach { r =>
      assert(r.getLong(1) == total)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= total)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    assert(rows("o_orderkey").getBoolean(5), "o_orderkey is the PK")
    assert(!rows("o_orderstatus").getBoolean(5), "3-value status is never a key")
    assert(rows("o_orderstatus").getLong(2) == 3)
    assert(rows("o_orderpriority").getLong(2) <= 5)
  }
}
