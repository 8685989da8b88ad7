package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster scale probe (driver-side tooling): a real crawl is
  * boilerplate-heavy — the same page body replicated thousands to
  * millions of times. Pairwise near-dup operators do Σ bucket² work,
  * so a K-identical-doc cluster costs O(K²) candidates no matter how
  * clever the banding is (every copy lands in every bucket together).
  * This probe builds sf0.001 + a K-copy cluster (identical text AND
  * identical embedding, fresh ids) and times the dedup/similarity
  * family at several K, so the quadratic wall is measured rather than
  * argued about.
  *
  * Usage: runMain graft.tools.DupBlast [K ...]   (default: 250 1000)
  *   SPARK_GRAFT_SF_DIR  source testdata (default sf0.001)
  */
object DupBlast {

  /** Layout-aware parquet copy shared by the blast probes (ADVICE r13):
    * the source may be a single parquet file (driver testdata) or a
    * Spark-written directory of part files — a bare Files.copy on the
    * latter copies only the empty directory entry, leaving confusing
    * downstream read failures.
    */
  private[tools] def copyParquetTable(srcDir: String, t: String,
      out: java.nio.file.Path): Unit = {
    val src = java.nio.file.Paths.get(s"$srcDir/$t.parquet")
    if (java.nio.file.Files.isDirectory(src))
      org.apache.commons.io.FileUtils.copyDirectory(
        src.toFile, out.resolve(s"$t.parquet").toFile)
    else {
      java.nio.file.Files.copy(src, out.resolve(s"$t.parquet"))
      ()
    }
  }

  private val probeQueries = Seq(
    "dd01_exact_dedup", "dd02_jaccard_pairs", "dd03_simhash",
    "dd04_minhash_lsh", "dd06_simhash_pairs", "dd08_dup_clusters",
    "dd09_curated_corpus", "dd13_quality_canonical", "dd14_minhash_curated",
    "dd18_prefix_filter", "dd19_containment",
    "dd05_cosine_pairs", "dd12_semantic_dedup", "sim03_ivf_topk")

  def build(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val out = java.nio.file.Paths.get(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
    java.nio.file.Files.createDirectories(out)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => DupBlast.copyParquetTable(srcDir, t, out))
    DupBlast.copyParquetTable(srcDir, "events", out)

    // the blast cluster replicates ONE real row (all columns), so it
    // passes every quality/shingle screen a synthetic string might
    // fail — only the id is fresh, far above the real range
    val docs = graft.Tables.documents(spark, srcDir)
    val oneDoc = docs.orderBy(length(col("text")).desc).limit(1).drop("doc_id")
    val copies = spark.range(k.toLong)
      .select((col("id") + 900000L).as("doc_id")).crossJoin(oneDoc)
    docs.unionByName(copies.select(docs.columns.map(col): _*))
      .coalesce(2).write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val emb = graft.Tables.embeddings(spark, srcDir)
    val oneVec = emb.orderBy(col("vec_id")).limit(1).drop("vec_id")
    val vecCopies = spark.range(k.toLong)
      .select((col("id") + 900000L).as("vec_id")).crossJoin(oneVec)
    emb.unionByName(vecCopies.select(emb.columns.map(col): _*))
      .coalesce(2).write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(250, 1000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-run temp base: two concurrent probe runs on one host must
    // not overwrite each other's shard mid-sweep (the ChaosGateSpec
    // lesson, ADVICE r11)
    val base = java.nio.file.Files.createTempDirectory("graft_dupblast_").toString
    for (k <- ks) {
      val dir = s"$base/k$k"
      build(spark, srcDir, dir, k)
      println(s"== K=$k ==")
      for (name <- probeQueries) {
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
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
