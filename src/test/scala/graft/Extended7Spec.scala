package graft

import org.apache.spark.sql.functions._

/** Round-7 third wave: the snapped-iteration TRAINING gates (logistic
  * GD, Lloyd k-means) actually learn — not just reproduce — and the
  * graph/Bloom operators keep their structural guarantees.
  */
class Extended7Spec extends SparkSpec {

  test("ml11 logistic GD beats the uninformed model and is deterministic") {
    val out = queries.Catalog.queries("ml11_logreg")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 5 GD steps from w=0 must cut log-loss below the ln(2)=0.6931 of
    // the all-zero model, and classify better than coin-flip
    assert(out("logloss") < 0.693)
    assert(out("accuracy") > 0.5)
    // the returnflag~quantity relationship in the synthetic data is
    // weak but the intercept must move toward the class prior
    assert(out("w_intercept") != 0.0)
    // re-running trains the identical model (snapped state, no RNG)
    val again = queries.Catalog.queries("ml11_logreg")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == again)
  }

  test("ml12 k-means partitions all points and tightens vs the init") {
    val out = queries.Catalog.queries("ml12_kmeans")(spark, Sf0001).collect()
    assert(out.length == 4)
    val total = out.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, Sf0001).count())
    // centroid x stays inside the quantity domain [1, 50]
    out.foreach { r =>
      val cx = r.getDouble(2)
      assert(cx >= 1.0 && cx <= 50.0)
    }
    // Lloyd iterations never increase within-cluster distance: final
    // avg dist must beat assigning everything to the worst init centroid
    val worstInit = Tables.lineitem(spark, Sf0001)
      .select(sqrt(pow(col("l_quantity") - 10.0, 2) +
        pow(col("l_extendedprice") / 10000.0 - 1.0, 2)).as("d"))
      .agg(avg(col("d"))).first().getDouble(0)
    val meanFinal = out.map(r => r.getDouble(4) * r.getLong(1)).sum / total
    assert(meanFinal < worstInit)
  }

  test("q90 triangle identities: transitivity in [0,1], wedges bound triangles") {
    val r = queries.Catalog.queries("q90_triangles")(spark, Sf0001).first()
    val (edges, tris, wedges, trans) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(edges > 0)
    // every triangle contains exactly 3 wedges
    assert(3 * tris <= wedges)
    assert(trans >= 0.0 && trans <= 1.0)
  }

  test("q91 Bloom filter has zero false negatives and a tiny FP rate") {
    val r = queries.Catalog.queries("q91_bloom_filter")(spark, Sf0001).first()
    val (members, probes, bloomPass, truePass) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(members > 0 && probes > members)
    // the defining guarantee: a Bloom filter never drops a member
    assert(bloomPass >= truePass)
    // m=65536, k=4, n≈members → theoretical fp ~ (1-e^(-4n/65536))^4;
    // at sf0.001 n is tens, so measured fp must be well under 5%
    assert(r.getDouble(5) < 0.05)
  }
}
