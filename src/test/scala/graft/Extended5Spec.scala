package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin
import graft.queries.Catalog
import graft.text.SpanDedup

class Extended5Spec extends SparkSpec {
  import spark.implicits._

  // --- SpanDedup.dedupSpans -------------------------------------------------

  private val w = "w1 w2 w3 w4 w5 w6 w7 w8" // one full 8-token span

  test("dedupSpans drops cross-doc duplicated spans from EVERY doc, keeps order") {
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 $w"),   // span0 unique, span1 shared
      (2L, s"$w b1 b2 b3 b4 b5 b6 b7 b8"),   // span0 shared, span1 unique
      (3L, "c1 c2 c3")                        // single short span, unique
    ).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, window = 8)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getInt(2))).toSeq ===
      Seq((1L, 2, 1), (2L, 2, 1), (3L, 1, 1)))
    // reassembly preserves original span order: doc2 keeps ITS OWN
    // second span, so its cleaned fp is md5 of the b-span, not the w-span
    val fp2 = r(1).getString(3)
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("b1 b2 b3 b4 b5 b6 b7 b8".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp2 === exp)
  }

  test("a doc whose every span is boilerplate keeps md5 of empty string") {
    val docs = Seq((1L, w), (2L, w)).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, window = 8).orderBy("doc_id").collect()
    assert(r.forall(_.getInt(2) == 0))
    assert(r.forall(_.getString(3) == "d41d8cd98f00b204e9800998ecf8427e"))
  }

  test("within-doc repetition alone is NOT removed (cross-doc criterion)") {
    val docs = Seq((1L, s"$w $w")).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, window = 8).collect()(0)
    assert(r.getInt(1) === 2 && r.getInt(2) === 2)
  }

  // --- SpanDedup.passageOverlap ---------------------------------------------

  test("winnowed passageOverlap detects a shared >= w+k-1 token passage at ANY alignment") {
    val shared = (1 to 15).map(i => s"s$i").mkString(" ") // exactly w+k-1 = 15
    val docs = Seq(
      (1L, s"$shared " + (1 to 9).map(i => s"x$i").mkString(" ")),
      // same passage at offset 3 — a strided scheme would miss this;
      // winnowing's content-defined selection cannot
      (2L, (1 to 3).map(i => s"y$i").mkString(" ") + s" $shared"),
      (3L, (1 to 32).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = SpanDedup.passageOverlap(docs, k = 8, w = 8)
      .orderBy("doc_id").collect()
    assert(r(0).getInt(2) > 0, "doc1 must flag shared fingerprints")
    assert(r(1).getInt(2) > 0, "doc2 must flag shared fingerprints despite offset 3")
    assert(r(2).getInt(2) === 0, "doc3 shares nothing")
  }

  test("passageOverlap drops docs with no full gram window") {
    val docs = Seq((1L, "a b c"), (2L, (1 to 16).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val r = SpanDedup.passageOverlap(docs, k = 8, w = 8)
    assert(r.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("winnowing selects every-alignment minima: shifting the whole doc never changes fps") {
    // content-defined selection: the fingerprint SET of a passage is
    // invariant under any prefix — append 5 junk tokens and the
    // passage's selected hashes must still all appear
    val body = (1 to 40).map(i => s"b$i").mkString(" ")
    val docs = Seq((1L, body), (2L, "j1 j2 j3 j4 j5 " + body)).toDF("doc_id", "text")
    val sel = SpanDedup.passageOverlap(docs, k = 8, w = 8).orderBy("doc_id").collect()
    // every doc1 fingerprint comes from body ⇒ shared with doc2
    assert(sel(0).getInt(1) === sel(0).getInt(2),
      "all of doc1's fingerprints must be found in shifted doc2")
  }

  // --- CountMin -------------------------------------------------------------

  test("CMS estimate is never below the exact count, and is exact when no collision") {
    val items = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val df = items.toDF("item")
    val cells = CountMin.counters(df, d = 4, w = 64)
    val est = CountMin.estimate(df.distinct(), cells, d = 4, w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 40L && est("beta") >= 7L && est("gamma") >= 1L)
    // 3 distinct items in 64 buckets × 4 rows: at least one row must be
    // collision-free for each item, so the min is exact here
    assert(est === Map("alpha" -> 40L, "beta" -> 7L, "gamma" -> 1L))
  }

  test("CMS counter tables are mergeable: sum of shard sketches == whole-corpus sketch") {
    val all = (1 to 200).map(i => s"tok${i % 13}")
    val (h1, h2) = all.splitAt(97)
    def sketch(xs: Seq[String]) = CountMin.counters(xs.toDF("item"), d = 4, w = 64)
    val merged = sketch(h1).unionByName(sketch(h2))
      .groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))
    val whole = sketch(all)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  // --- Ann.quantizedTopK ----------------------------------------------------

  private def embFixture = {
    val rnd = new scala.util.Random(7)
    (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("quantizedTopK is partitioning-invariant (integer ranking, no float ties)") {
    val emb = embFixture
    val q = emb.filter($"vec_id" < 5)
    val a = graft.similarity.Ann.quantizedTopK(emb, q, "vec_id", "embedding", k = 3).collect()
    val b = graft.similarity.Ann.quantizedTopK(emb.repartition(7), q, "vec_id", "embedding", k = 3)
      .collect()
    assert(a.sortBy(r => (r.getLong(0), r.getInt(1))).toSeq ===
      b.sortBy(r => (r.getLong(0), r.getInt(1))).toSeq)
  }

  // --- ops.Stats ------------------------------------------------------------

  test("zscoreOutliers flags exactly the far row, never NULL-z groups") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 10.0),
      ("a", 5L, 100.0),      // the outlier: z ≈ 1.9999... → rounds to 2.0
      ("b", 6L, 5.0)         // single-row group: sd NULL, never flagged
    ).toDF("g", "id", "v")
    val r = graft.ops.Stats.zscoreOutliers(df, "g", "v", zMin = 2.0)
    // n=5, one far point: its z = (100-28)/sd; sd=√(4·18²+72²)/2... the
    // invariant under test is membership, not the constant: only group a's
    // max can clear the threshold and group b must never appear
    val flagged = r.select("id").as[Long].collect().toSet
    assert(!flagged.contains(6L))
    assert(flagged.subsetOf(Set(5L)))
  }

  test("zscoreOutliers rounds before comparing (boundary z exactly at threshold)") {
    // 4 points symmetric: values -1,-1,1,1 → mean 0, sd_samp = 1.1547;
    // z = ±0.866 rounds to ±0.866 — with zMin 0.866 all four flag, with
    // 0.8661 none do: the compare sees the ROUNDED value
    val df = Seq(("g", 1L, -1.0), ("g", 2L, -1.0), ("g", 3L, 1.0), ("g", 4L, 1.0))
      .toDF("g", "id", "v")
    assert(graft.ops.Stats.zscoreOutliers(df, "g", "v", 0.866).count() === 4)
    assert(graft.ops.Stats.zscoreOutliers(df, "g", "v", 0.8661).count() === 0)
  }

  test("groupSample returns exactly n per group, stable under repartitioning") {
    val df = (1L to 100L).map(i => (s"g${i % 4}", i)).toDF("g", "k")
    val a = graft.ops.Stats.groupSample(df, "g", "k", n = 5)
    assert(a.groupBy("g").count().select("count").as[Long].collect().forall(_ == 5L))
    val b = graft.ops.Stats.groupSample(df.repartition(13), "g", "k", n = 5)
    assert(a.select("g", "k").except(b.select("g", "k")).isEmpty)
  }

  // --- Dedup.sortedNeighborhoodPairs ----------------------------------------

  test("sortedNeighborhood pairs only within block and window, scored by levenshtein") {
    val df = Seq(
      (1L, "alpha one"), (2L, "alpha onf"), (3L, "alpha zzz"),
      (4L, "beta one"),  // different block — never paired with alphas
      (5L, "alpha ong")
    ).toDF("id", "name")
    val r = graft.dedup.Dedup.sortedNeighborhoodPairs(
        df, "id", "name", org.apache.spark.sql.functions.expr("split_part(name, ' ', 1)"),
        window = 2, maxDist = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // sorted alphas: one(1) < onf(2) < ong(5) < zzz(3); window 2 pairs
    // with dist ≤ 1: (1,2),(2,5); (1,5) has dist 1 and rn-gap 2 → kept
    assert(r === Set((1L, 2L), (2L, 5L), (1L, 5L)))
    assert(!r.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("spanNovelty: copier scores 0, originator keeps 1, within-doc repeats stay novel") {
    val eight = "a b c d e f g h"
    val other = "p q r s t u v w"
    val docs = Seq(
      (1L, s"$eight $other"),    // originator of both spans → novelty 1.0
      (2L, eight),               // copies doc 1's first span → novelty 0.0
      (3L, s"$eight $eight"),    // copies doc 1 twice → 0.0 (cross-doc, not self)
      (4L, "x y z only four"),   // unique partial span → 1.0
    ).toDF("doc_id", "text")
    val m = SpanDedup.spanNovelty(docs, window = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L) === ((2L, 2L, 1.0)))
    assert(m(2L) === ((1L, 0L, 0.0)))
    assert(m(3L) === ((2L, 0L, 0.0)))
    assert(m(4L) === ((1L, 1L, 1.0)))
  }

  test("quality percentile: pct_le is the exact CDF of rounded scores") {
    val out = Catalog.queries("tx17_quality_percentile")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val n = out.length.toDouble
    // recompute the CDF directly from the returned qualities
    out.foreach { case (_, q, pct) =>
      val expected = out.count(_._2 <= q) / n
      assert(math.abs(pct - math.round(expected * 1e4) / 1e4) < 1e-9,
        s"pct_le($q) = $pct, expected $expected")
    }
    // top score must have pct_le 1.0
    assert(out.maxBy(_._2)._3 === 1.0)
  }

  test("transition matrix: hand-computed first-order Markov estimate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q86_").toString
    // ts stored as raw NANOS (the driver data's TIMESTAMP(NANOS)
    // shape that Tables.events rebuilds from a long column)
    def t(m: Int): Long = (1767225600L + m * 60L) * 1000000000L
    // user 1: A→B→A; user 2: B→B — margins A:1, B:2
    Seq((1L, t(0), 1L, "A", 0.0, null.asInstanceOf[String]),
        (2L, t(1), 1L, "B", 0.0, null.asInstanceOf[String]),
        (3L, t(2), 1L, "A", 0.0, null.asInstanceOf[String]),
        (4L, t(0), 2L, "B", 0.0, null.asInstanceOf[String]),
        (5L, t(1), 2L, "B", 0.0, null.asInstanceOf[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = Catalog.queries("q86_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m === Map(("A", "B") -> ((1L, 1.0)), ("B", "A") -> ((1L, 0.5)),
      ("B", "B") -> ((1L, 0.5))))
  }

  test("source contamination: shared 5-grams counted once per source pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx18_").toString
    val shared = "one two three four five"
    Seq((1L, s"$shared alpha", "web", 0L), (2L, s"$shared beta", "web", 0L),
        (3L, s"$shared gamma", "api", 0L), (4L, "wholly unrelated text body here", "book", 0L))
      .toDF("doc_id", "text", "source", "n_chars")
      .withColumn("lang", lit("en"))
      .write.parquet(s"$dir/documents.parquet")
    val rows = Catalog.queries("tx18_source_contamination")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the only cross-source shared shingle is the 5-gram "one..five"
    // (api↔web); book shares nothing with anyone
    assert(rows.toSeq === Seq(("api", "web", 1L)))
  }

  test("temperature mix: alpha weights up-sample the small source, sums are 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx07_").toString
    (Seq.fill(16)("big") ++ Seq.fill(4)("small")).zipWithIndex
      .map { case (src, i) => (i.toLong, s"text $i", src, 0L) }
      .toDF("doc_id", "text", "source", "n_chars")
      .withColumn("lang", lit("en"))
      .write.parquet(s"$dir/documents.parquet")
    val m = Catalog.queries("mx07_temperature_mix")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m("big") === ((16L, 0.8, 0.6667)))  // sqrt(16)/(4+2) = 2/3 @ 4dp
    assert(m("small") === ((4L, 0.2, 0.3333))) // sqrt(4)/6 = 1/3 @ 4dp
    assert(math.abs(m.values.map(_._3).sum - 1.0) < 1e-3) // 4dp rounding slack
  }

  test("curation funnel is monotone and its final stage equals the curated corpus") {
    val funnel = Catalog.queries("mx06_curation_funnel")(spark, Sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(funnel.keySet === (1 to 6).toSet)
    assert((1 to 5).forall(i => funnel(i) >= funnel(i + 1)), s"not monotone: $funnel")
    val curated = Catalog.queries("mx05_curation_pipeline")(spark, Sf0001).count()
    assert(funnel(6) === curated)
  }

  test("bigramNll: hand-computed interpolated probabilities on a two-doc corpus") {
    // corpus tokens: doc1 = [a b a], doc2 = [b b]  → N=5, cu(a)=2, cu(b)=3
    // bigrams: (a,b) (b,a) (b,b); cctx(a)=1, cctx(b)=2
    val docs = Seq((1L, "a b a"), (2L, "b b")).toDF("doc_id", "text")
    val out = graft.text.TextStats.bigramNll(docs, "doc_id", "text", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (pA, pB) = (2.0 / 5, 3.0 / 5)
    // doc1: p(a)=pA, p(b|a)=0.7*1/1+0.3*pB, p(a|b)=0.7*1/2+0.3*pA
    val d1 = -(math.log(pA) + math.log(0.7 + 0.3 * pB) + math.log(0.35 + 0.3 * pA)) / 3
    // doc2: p(b)=pB, p(b|b)=0.7*1/2+0.3*pB
    val d2 = -(math.log(pB) + math.log(0.35 + 0.3 * pB)) / 2
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === math.round(d1 * 1e4) / 1e4)
    assert(out(2L)._1 === 2L)
    assert(out(2L)._2 === math.round(d2 * 1e4) / 1e4)
  }

  test("keySkewProfile computes exact metrics on a known distribution") {
    // key 1 → 6 rows, keys 2..5 → 1 row each: n_keys=5, total=10, max=6
    val df = (Seq.fill(6)(1) ++ Seq(2, 3, 4, 5)).toDF("k")
    val m = graft.ops.Stats.keySkewProfile(df, "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_keys") === 5.0)
    assert(m("total_rows") === 10.0)
    assert(m("max_cnt") === 6.0)
    assert(m("avg_cnt") === 2.0)
    assert(m("skew_ratio") === 3.0)
    assert(m("top10_share") === 1.0) // only 5 keys — top-10 covers everything
    // ceil(0.99*5)=5 keys must be <= p99 count → the max, 6
    assert(m("p99_cnt") === 6.0)
  }

  test("quantizedTopK recall vs exact brute force is high at int8 precision") {
    val emb = embFixture
    val q = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.similarity.Ann.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5))
    val quant = pairs(graft.similarity.Ann.quantizedTopK(emb, q, "vec_id", "embedding", k = 5))
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall too low: $recall")
  }
}
