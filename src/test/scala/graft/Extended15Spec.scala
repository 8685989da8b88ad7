package graft

import org.apache.spark.sql.functions._

/** Round-7 eleventh wave: containment's defining asymmetry (a subset
  * document scores 1.0 where Jaccard stays low) and k-NN structural
  * invariants.
  */
class Extended15Spec extends SparkSpec {

  test("dd19: containment >= jaccard always; subset fixture hits 1.0") {
    val out = queries.Catalog.queries("dd19_containment")(spark, Sf0001)
      .collect()
    out.foreach { r =>
      val (cont, jac) = (r.getDouble(3), r.getDouble(4))
      // |A∩B|/min ≥ |A∩B|/|A∪B| by definition
      assert(cont >= jac - 1e-9)
      assert(cont >= 0.8 && cont <= 1.0)
    }
    // the asymmetry the operator exists for, on a planted subset:
    // a 20-shingle excerpt inside a 200-shingle doc → containment 1,
    // jaccard ~0.1 (same building blocks as the engine)
    import spark.implicits._
    val big = (1 to 202).map(i => s"tok$i").mkString(" ")
    val small = (1 to 22).map(i => s"tok$i").mkString(" ")
    val sh = Seq((1L, big), (2L, small)).toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as("t3"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Hash48(col("t3")).as("h"))
      .distinct()
    val szs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inter = sh.as("a").join(sh.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")).count()
    val cont = inter.toDouble / math.min(szs(1L), szs(2L))
    val jac = inter.toDouble / (szs(1L) + szs(2L) - inter)
    assert(cont == 1.0, s"subset containment $cont")
    assert(jac < 0.15, s"subset jaccard $jac stays below any dedup threshold")
  }

  test("ml17 k-NN: every query classified, votes bounded, flags consistent") {
    val out = queries.Catalog.queries("ml17_knn")(spark, Sf0001).collect()
    assert(out.length == 20)
    val labels = Tables.embeddings(spark, Sf0001)
      .select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    out.foreach { r =>
      val (actual, pred, nVotes, correct) =
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))
      assert(labels.contains(pred))
      assert(nVotes >= 1 && nVotes <= 5)
      assert(correct == (pred == actual))
    }
    // deterministic on re-run (rounded-cosine rank, id tie-breaks)
    val again = queries.Catalog.queries("ml17_knn")(spark, Sf0001).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ml18 PRF reconciles with ml14's confusion matrix") {
    val prf = queries.Catalog.queries("ml18_nb_prf")(spark, Sf0001).collect()
    val conf = queries.Catalog.queries("ml14_naive_bayes")(spark, Sf0001)
      .collect()
    val confTotal = conf.map(_.getLong(2)).sum
    val confDiag = conf.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    // Σtp over classes is the confusion diagonal; Σna is the test size
    assert(prf.map(_.getLong(1)).sum == confDiag)
    assert(prf.map(_.getLong(2)).sum == confTotal)
    prf.foreach { r =>
      val (tp, na, np, p, rec, f1) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(tp <= math.min(na, np))
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1)
      // a never-predicted class reports precision 0 by convention
      if (np == 0) assert(p == 0.0)
      // F1 is the harmonic mean of the ROUNDED P/R (both engines agree)
      val expF1 = if (p + rec == 0) 0.0
        else math.round(2 * p * rec / (p + rec) * 1e4) / 1e4
      assert(math.abs(f1 - expF1) < 1e-9)
    }
  }
}
