package graft

import org.apache.spark.sql.functions._

/** Round-7 sixth wave: Naive Bayes structural invariants, the MIPS
  * reduction's defining monotonicity, and skyline exactness against a
  * brute-force dominance check.
  */
class Extended10Spec extends SparkSpec {

  test("ml14 confusion matrix reconciles and the split covers every class") {
    val out = queries.Catalog.queries("ml14_naive_bayes")(spark, Sf0001)
      .localCheckpoint()
    val total = out.agg(sum(col("n"))).first().getLong(0)
    // totals must equal the md5-bucket test split size
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), graft.text.TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .filter(graft.dedup.Dedup.md5Hash48(col("doc_id").cast("string")) % 5 === 0)
    assert(total == docs.count())
    // the hash split must leave every source represented in test
    // (the naive doc_id%5 split left four sources with zero training
    // docs — the regression this spec exists to catch)
    val nActual = out.select(col("actual")).distinct().count()
    val nSources = Tables.documents(spark, Sf0001)
      .select(col("source")).distinct().count()
    assert(nActual == nSources, s"test covers $nActual of $nSources sources")
    // deterministic: identical confusion matrix on re-run
    val again = queries.Catalog.queries("ml14_naive_bayes")(spark, Sf0001)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("sim10 augmented-cosine order equals dot-product order per query") {
    val out = queries.Catalog.queries("sim10_mips")(spark, Sf0001).collect()
    assert(out.length == 15) // 5 queries × top-3
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      // the reduction's guarantee: rank by dot ⇒ aug_cos non-increasing
      val cos = byRank.map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"aug_cos not monotone: ${cos.mkString(",")}")
      val dots = byRank.map(_.getDouble(3))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("q96 skyline equals the brute-force Pareto frontier") {
    val out = queries.Catalog.queries("q96_skyline")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    val parts = Tables.part(spark, Sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, opr, osz) =>
        opr <= pr && osz >= sz && (opr < pr || osz > sz)
      }
    }.map(_._1).toSet
    assert(out == brute,
      s"skyline mismatch: missing ${brute -- out}, extra ${out -- brute}")
  }
}
