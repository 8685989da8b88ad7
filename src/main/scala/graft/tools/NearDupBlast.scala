package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Near-identical-cluster scale probe (driver-side tooling): the r12
  * DupBlast covered BYTE-identical boilerplate, which the exact-first
  * collapse absorbs for one linear shuffle. A real crawl's boilerplate
  * is usually near-identical instead — the same page body with one
  * mutated token (a session id, a timestamp, a view counter) — and
  * that cluster defeats the collapse by construction: every copy has a
  * distinct md5, yet all K copies still share virtually every shingle,
  * so they land together in every LSH band bucket and every inverted-
  * index posting list. Every pairwise candidate generator then does
  * Σ bucket² work: O(K²) candidates for one cluster, no matter how the
  * banding is tuned. This probe builds sf0.001 + a K-copy NEAR-dup
  * cluster (one unique suffix token per copy, jaccard ≈ 1 − 2n/|sh|)
  * and times the near-dup family at several K, so the quadratic wall —
  * and any mitigation's effect — is measured rather than argued about.
  *
  * Usage: runMain graft.tools.NearDupBlast [K ...]   (default: 250 1000)
  *   SPARK_GRAFT_SF_DIR  source testdata (default sf0.001)
  */
object NearDupBlast {

  private val probeQueries = Seq(
    "dd01_exact_dedup", "dd02_jaccard_pairs", "dd04_minhash_lsh",
    "dd08_dup_clusters", "dd09_curated_corpus", "dd13_quality_canonical",
    "dd14_minhash_curated")

  def build(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val out = java.nio.file.Paths.get(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
    java.nio.file.Files.createDirectories(out)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings")
      .foreach(t => DupBlast.copyParquetTable(srcDir, t, out))
    // the blast cluster replicates ONE real long doc with a unique
    // trailing token per copy ("sid<i>"): distinct bytes (the collapse
    // must NOT merge them), near-total shingle overlap (every pairwise
    // stage must treat them as one giant near-dup cluster)
    val docs = graft.Tables.documents(spark, srcDir)
    val oneDoc = docs.orderBy(length(col("text")).desc).limit(1).drop("doc_id")
    val copies = spark.range(k.toLong)
      .select((col("id") + 900000L).as("doc_id"), col("id"))
      .crossJoin(oneDoc)
      .withColumn("text", concat(col("text"), lit(" sid"), col("id").cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("id")
    docs.unionByName(copies.select(docs.columns.map(col): _*))
      .coalesce(2).write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(250, 1000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_neardupblast_").toString
    for (k <- ks) {
      val dir = s"$base/k$k"
      build(spark, srcDir, dir, k)
      println(s"== K=$k ==")
      // SPARK_GRAFT_AB_ONLY=1 skips the catalog sweep and runs only the
      // star-cap A/B below — the exact arm is O(K²), so the big-K
      // scaling receipt shouldn't pay for seven quadratic catalog runs
      val abOnly = sys.env.get("SPARK_GRAFT_AB_ONLY").contains("1")
      for (name <- probeQueries if !abOnly) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val res =
          try Right(graft.SparkEntry.queries(name)(spark, dir).count())
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}") }
        val dt = (System.nanoTime() - t0) / 1e9
        res match {
          case Right(n) => println(f"$name%-24s $dt%8.2fs rows=$n%d")
          case Left(e) => println(f"$name%-24s $dt%8.2fs THREW $e")
        }
      }
      // A/B the star cap on the dd14 composition: same collapse-first
      // shape, exact candidates vs starCap=64. The receipt sought is
      // "identical kept set, quadratic term gone".
      import graft.dedup.Dedup
      for ((label, cap) <- Seq(("dd14-shape exact", Int.MaxValue),
                               ("dd14-shape starCap=64", 64))) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val kept = Dedup.minHashCuratedCorpus(
            Dedup.collapseIdenticalTexts(
              graft.Tables.documents(spark, dir), "doc_id", "text", minTokens = 3),
            "doc_id", "text", n = 3, bands = 8, rowsPerBand = 4, threshold = 0.5,
            starCapBucketSize = cap)
          .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("doc_id"))), lit(0L)))
          .first()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$label%-24s $dt%8.2fs rows=${kept.getLong(0)}%d idxor=${kept.getLong(1)}%016x")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
