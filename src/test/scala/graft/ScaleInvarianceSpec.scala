package graft

import graft.queries.Catalog

/** Partition-count invariance: on a 1000-executor cluster the shuffle
  * partitioning is an ops knob, not a semantic input — any query whose
  * result changes with `spark.sql.shuffle.partitions` is broken at
  * scale no matter what the sf0.01 gate says. Representative
  * order-sensitive shapes (windowed sessionization, ranking, LSH
  * banding, packing, global shard offsets, fixed-point iterative
  * training, graph iteration) run under 1 / 3 / 17 shuffle partitions
  * and must produce byte-identical row multisets.
  *
  * 1 partition degenerates every shuffle (catches accidental reliance
  * on intra-partition order); 17 is prime and larger than most group
  * cardinalities at sf0.001 (catches hash-distribution sensitivity and
  * empty-partition handling).
  */
class ScaleInvarianceSpec extends SparkSpec {

  private val subjects = Seq(
    "q62_sessionize",     // per-user gap windows
    "q22_window_rank",    // ranking window + filter
    "dd04_minhash_lsh",   // banded signature bucket join
    "mx01_pack",          // greedy packing window
    "mx10_shard_manifest",// global layout offsets from bucket histogram
    "ml11_logreg",        // fixed-point gradient descent (summation order)
    "q74_pagerank",       // unrolled iterative joins
    // sketch estimates may legitimately vary with partitioning (KLL
    // compactor merge order); the GATE output (error-bound booleans +
    // exact counts) must not — that absorption is the design claim
    "q38c_hll_error_gate",
    "tx17_quality_percentile", // histogram-CDF percentile (exact, no sketch)
    // connected components via min-id propagation (r10): the iteration
    // itself is order-sensitive — each round's min must be a pure
    // function of the edge set, never of which partition delivered a
    // candidate first, or cluster ids diverge across cluster layouts
    "dd08_dup_clusters",
    "dd11_passage_clusters",
    // MLlib PCA Gram accumulation order varies with partitioning; the
    // ml05c GATE output (exact counts + wide-margin booleans) must
    // absorb that float drift — same design claim as q38c
    "ml05c_pca_variance_gate")

  private def run(name: String, parts: String): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try Catalog.queries(name)(spark, Sf0001)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  subjects.foreach { name =>
    test(s"$name is invariant under shuffle partitions 1 / 3 / 17") {
      val base = run(name, "4")
      assert(base.nonEmpty)
      Seq("1", "3", "17").foreach { p =>
        val got = run(name, p)
        assert(got === base,
          s"$name changed results under $p shuffle partitions " +
            s"(first diff: ${got.zip(base).find(t => t._1 != t._2)})")
      }
    }
  }

  // AQE rewrites physical plans at runtime (partition coalescing,
  // SMJ→BHJ conversion, skew-join splitting) — another knob a cluster
  // operator flips that must never change results.
  subjects.foreach { name =>
    test(s"$name is invariant under AQE on/off") {
      def runAqe(enabled: String): Seq[String] = {
        spark.conf.set("spark.sql.adaptive.enabled", enabled)
        try Catalog.queries(name)(spark, Sf0001)
          .collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      val on = runAqe("true")
      assert(on.nonEmpty)
      assert(runAqe("false") === on, s"$name changed results with AQE disabled")
    }
  }

  // Chaos invariance: determinism must extend to DEGENERATE data — a
  // corpus with empty/NULL text, zero/NaN vectors and NULL event
  // fields (the ChaosSmoke shard). NULL routes through different code
  // (null window partitions, nulls-first ordering, null-safe join
  // keys, the finite screens), and each of those must also be a pure
  // function of the data, not of partition delivery order.
  private lazy val chaosDir: String = {
    val dir = "/tmp/graft_chaos_spec"
    graft.tools.ChaosSmoke.build(spark, Sf0001, dir)
    dir
  }

  private val chaosSubjects = Seq(
    "q62_sessionize",          // NULL-ts events open their own sessions
    "dd08_dup_clusters",       // CC over a corpus with sub-shingle docs
    "dd04_minhash_lsh",        // banding with docs that have no shingles
    "tx17_quality_percentile", // quality histogram now contains the 0.0 bucket
    "mx10_shard_manifest",     // layout offsets with degenerate docs in the corpus
    "ml05c_pca_variance_gate", // PCA gate over the finite+shape-screened corpus
    "q93_interp")              // clamped spine + reversed cumulative fill frames
                               // (r11) over year-0001/9999 poisoned timestamps

  chaosSubjects.foreach { name =>
    test(s"$name is invariant under 3 / 17 shuffle partitions on chaos data") {
      def runChaos(parts: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try Catalog.queries(name)(spark, chaosDir)
          .collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val base = runChaos("3")
      assert(base.nonEmpty)
      assert(runChaos("17") === base,
        s"$name changed results across partition counts on degenerate data")
    }
  }
}
