package graft

import org.apache.spark.sql.functions._

/** Round-7 seventh wave: PSI detects planted drift (and reports the
  * stationary generator as stable), and the merged KMV union sketch is
  * EXACTLY the sketch of the union.
  */
class Extended11Spec extends SparkSpec {

  test("dq02 reports the stationary generator stable, and PSI >= 0") {
    val out = queries.Catalog.queries("dq02_drift_psi")(spark, Sf0001).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getDouble(1) >= 0.0, s"${r.getString(0)} psi negative")
      assert(r.getBoolean(2), s"${r.getString(0)} flagged unstable on stationary data")
    }
  }

  test("PSI formula moves on planted drift and vanishes on identity") {
    import spark.implicits._
    // same smoothing arithmetic as dq02, on planted histograms
    def psi(cr: Seq[Long], cp: Seq[Long]): Double = {
      val df = cr.zip(cp).zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }.toDF("b", "cr", "cp")
      val t = df.agg(sum($"cr").as("nr"), sum($"cp").as("np"),
        count(lit(1)).as("nb"))
      df.crossJoin(t)
        .select((($"cr" + 1) / ($"nr" + $"nb").cast("double")).as("p"),
          (($"cp" + 1) / ($"np" + $"nb").cast("double")).as("q"))
        .agg(sum(($"p" - $"q") * log($"p" / $"q"))).first().getDouble(0)
    }
    val flat = Seq(100L, 100L, 100L, 100L)
    val shifted = Seq(10L, 40L, 150L, 200L)
    assert(psi(flat, flat) == 0.0)
    assert(psi(shifted, flat) > 0.1, "planted drift must trip the threshold")
  }

  test("q97 merged union sketch equals a direct union sketch; envelopes hold") {
    val r = queries.Catalog.queries("q97_kmv_setops")(spark, Sf0001).first()
    val (estR, estA, estU, estI) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val (exR, exA, exU) = (r.getLong(4), r.getLong(5), r.getLong(6))
    // k=32 KMV: relative error ~ 1/sqrt(k); generous envelope
    assert(math.abs(estR - exR) < 0.5 * exR + 10, s"estR=$estR exact=$exR")
    assert(math.abs(estA - exA) < 0.5 * exA + 10)
    assert(math.abs(estU - exU) < 0.5 * exU + 10)
    // inclusion-exclusion on estimates must stay near the exact intersection
    val exI = exR + exA - exU
    assert(math.abs(estI - exI) < 0.5 * exU + 10, s"estI=$estI exact=$exI")
    // mergeability, exactly: the per-seed min over the union IS the min
    // of the two per-set minima, so a sketch computed directly on the
    // union must yield the identical estimate
    val li = Tables.lineitem(spark, Sf0001)
      .filter(col("l_returnflag").isin("R", "A")).select(col("l_partkey"))
    val mins = (0 until 32).map(i => min(graft.dedup.Dedup.md5Hash48(
      concat_ws(":", lit(i), col("l_partkey").cast("string")))).as(s"u$i"))
    val direct = li.agg(mins.head, mins.tail: _*).first()
    val sumMin = (0 until 32).map(direct.getLong).sum
    val directEst = math.round((32.0 * 281474976710656.0 / sumMin - 1) * 100) / 100.0
    assert(directEst == estU, s"direct=$directEst merged=$estU")
  }
}
