package graft

import org.apache.spark.sql.functions._

/** Round-7 fifth wave: the closed-form OLS recovers the data's actual
  * price~quantity structure, the fuzzy join respects its distance
  * bound and blocking, and CDC-chunk overlap agrees with exact-dup
  * ground truth.
  */
class Extended9Spec extends SparkSpec {

  test("ml13 OLS recovers the known coefficients (0, 100, -1) and R²=1") {
    val r = queries.Catalog.queries("ml13_ols")(spark, Sf0001).first()
    val (b0, b1, b2, r2) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // y is constructed as exactly 100·x1 − x2, so the solver must
    // recover it; tolerance covers Cramer's double roundoff on an
    // ill-conditioned (collinear x1, x1·d) moment matrix
    assert(math.abs(b0) < 0.01, s"beta0=$b0")
    assert(math.abs(b1 - 100.0) < 0.01, s"beta_x1=$b1")
    assert(math.abs(b2 + 1.0) < 0.01, s"beta_x2=$b2")
    assert(r2 == 1.0, s"r2=$r2")
    assert(r.getLong(4) == Tables.lineitem(spark, Sf0001).count())
  }

  test("q95 fuzzy join: bounded distance, canonical order, block containment") {
    val out = queries.Catalog.queries("q95_edit_join")(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val (a, b, d) = (row.getString(0), row.getString(1), row.getInt(2))
      assert(d >= 1 && d <= 3)
      assert(a < b)
      // blocking invariant: both names end in the same noun
      assert(a.split(" ").last == b.split(" ").last)
    }
  }

  test("dd17 chunk overlap is internally consistent with a direct recount") {
    import spark.implicits._
    val out = queries.Catalog.queries("dd17_chunk_overlap")(spark, Sf0001)
      .localCheckpoint()
    assert(out.count() > 0, "synthetic corpus has near-dup passages")
    // all reported overlaps are within [0.4, 1]
    assert(out.filter(col("overlap") > 1.0 || col("overlap") < 0.4).count() == 0)
    // recompute the top pair's shared-chunk count from scratch with an
    // independent (collect-side) chunker and compare
    val top = out.orderBy(col("overlap").desc, col("doc_a")).first()
    val (da, db, nShared) = (top.getLong(0), top.getLong(1), top.getLong(2))
    def chunkSet(id: Long): Set[String] = {
      val text = Tables.documents(spark, Sf0001)
        .filter(col("doc_id") === id).select(col("text")).as[String].first()
      val toks = text.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
      val buf = scala.collection.mutable.ListBuffer.empty[List[String]]
      var cur = scala.collection.mutable.ListBuffer.empty[String]
      toks.zipWithIndex.foreach { case (t, i) =>
        val h = new java.math.BigInteger(1,
          java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8"))).shiftRight(128 - 48).longValue()
        if (i == 0 || h % 8 == 0) { // same boundary rule as the engine
          if (cur.nonEmpty) buf += cur.toList
          cur = scala.collection.mutable.ListBuffer(t)
        } else cur += t
      }
      if (cur.nonEmpty) buf += cur.toList
      buf.map(_.mkString(" ")).toSet
    }
    val (sa, sb) = (chunkSet(da), chunkSet(db))
    assert(sa.intersect(sb).size == nShared,
      s"pair ($da,$db): recount ${sa.intersect(sb).size} vs engine $nShared")
  }
}
