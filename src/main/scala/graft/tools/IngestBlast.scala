package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-store ingest blast probe (driver-side tooling): the r13
  * NearDupBlast measured the WITHIN-corpus quadratic wall (and the
  * star cap killed it); this measures the remaining pairwise generator
  * in the dedup family — `Dedup.minHashDedupAgainstCorpus`, the
  * cross-store gate behind dd07/dd16 and the streaming ingest loop.
  * Its candidate set is `bIn ⋈ bC` on (band, band_key), so a
  * near-identical boilerplate family present on BOTH sides (K_in
  * incoming copies of a page whose K_c mutated copies already sit in
  * the store) emits K_in × K_c candidates per shared bucket — the
  * two-sided face of the same pathology. In the SHIPPED composition
  * the store holds only curation survivors (families collapse to ~one
  * member before entering), so the blowup needs a raw/seeded store —
  * but `minHashDedupAgainstCorpus` is a public operator and dd16's
  * corpus argument is arbitrary, so the regime must be measured, not
  * assumed away.
  *
  * Usage: runMain graft.tools.IngestBlast [K ...]   (default: 250 1000)
  *   SPARK_GRAFT_SF_DIR  source testdata (default sf0.001)
  * Prints, per K: candidate count (the law), wall time of the exact
  * arm, and — once a mitigation exists — the capped arm's A/B.
  */
object IngestBlast {

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(250, 1000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    val docs = graft.Tables.documents(spark, srcDir)
      .select(col("doc_id"), col("text"))
    // the same blast body NearDupBlast uses: ONE real long doc, so the
    // copies pass every shingle/quality screen a synthetic string might
    // not, replicated with a unique trailing token per copy
    val body = docs.orderBy(length(col("text")).desc).limit(1)
      .select(col("text")).first().getString(0)

    for (k <- ks) {
      // store side: real corpus + K near-identical "session" copies
      val corpus = docs.unionByName(
        spark.range(k.toLong).select((col("id") + 900000L).as("doc_id"),
          concat(lit(body + " sid"), col("id").cast("string")).as("text")))
        .localCheckpoint()
      // incoming side: K near-identical copies of the SAME page (fresh
      // crawl of the boilerplate) + one genuinely novel doc
      val incoming = spark.range(k.toLong)
        .select((col("id") + 800000L).as("doc_id"),
          concat(lit(body + " tid"), col("id").cast("string")).as("text"))
        .unionByName(spark.range(1).select(lit(810000L).as("doc_id"),
          lit("entirely novel content with no shared shingles anywhere here today").as("text")))
        .localCheckpoint()
      println(s"== K=$k (incoming ${k + 1}, corpus rows ${corpus.count()}) ==")

      // the candidate law, measured directly from the public banding
      val bIn = Dedup.bandedSignatureKeys(incoming, "doc_id", "text")
        .toDF("in_doc", "band", "band_key")
      val bC = Dedup.bandedSignatureKeys(corpus, "doc_id", "text")
        .toDF("c_doc", "band", "band_key")
      val nCand = bIn.join(bC, Seq("band", "band_key"))
        .select(col("in_doc"), col("c_doc")).distinct().count()
      println(f"candidates (exact bIn⋈bC): $nCand%,d")

      // SPARK_GRAFT_CAP_ONLY=1 skips the exact arm — it is O(K²) by
      // the law above, so the big-K flatness receipt for the capped arm
      // shouldn't pay for a quadratic run
      val capOnly = sys.env.get("SPARK_GRAFT_CAP_ONLY").contains("1")
      val arms = Seq(("exact", Int.MaxValue), ("corpusCap=8", 8))
        .filter { case (l, _) => !capOnly || l != "exact" }
      for ((label, cap) <- arms) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val kept = Dedup.minHashDedupAgainstCorpus(incoming, corpus,
            "doc_id", "text", corpusBucketCap = cap)
          .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("doc_id"))), lit(0L)))
          .first()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$label%-14s $dt%8.2fs kept=${kept.getLong(0)}%d idxor=${kept.getLong(1)}%016x")
      }
    }
    spark.stop()
  }
}
