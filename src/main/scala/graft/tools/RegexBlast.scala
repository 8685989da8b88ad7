package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-regex scale probe: Java's backtracking regex engine is
  * O(len²) on patterns of the form `cls1+@cls2+\.suffix` over text
  * that feeds the classes but never completes the match — every start
  * position consumes the rest of the run before failing, and a crawl
  * WILL contain such runs (base64 blobs, URLs with userinfo, minified
  * JS). A Python feasibility check of the tx09 email pattern read
  * 2.3 / 9.1 / 36 s at 50k / 100k / 200k chars of `a@bbb…`; this
  * probe measures the same on Spark's engine (java.util.regex) via
  * the real tx09 query, so the wall is established — or cleared — on
  * the exact code path that ships.
  *
  * Usage: runMain graft.tools.RegexBlast [N ...]  (default 50k 100k 200k)
  *   SPARK_GRAFT_SF_DIR  source testdata (default sf0.001)
  */
object RegexBlast {

  /** The adversarial row: one '@' then a run that keeps the domain
    * class fed but never yields `\.[A-Za-z]{2,}`.
    */
  private[tools] def advText(n: Int): String = "a@" + "b" * n

  def build(spark: SparkSession, srcDir: String, outDir: String, n: Int): Unit = {
    val out = java.nio.file.Paths.get(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
    java.nio.file.Files.createDirectories(out)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings")
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$srcDir/$t.parquet"), out.resolve(s"$t.parquet"))
      }
    val docs = graft.Tables.documents(spark, srcDir)
    val proto = docs.select(col("lang"), col("source")).head()
    val txt = advText(n)
    import spark.implicits._
    val adv = Seq((900000L, txt, proto.getString(0), proto.getString(1),
      txt.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(adv.select(docs.columns.map(col): _*))
      .coalesce(2).write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ns = if (args.nonEmpty) args.toSeq.map(_.toInt)
             else Seq(50000, 100000, 200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_regexblast_").toString
    for (n <- ns) {
      val dir = s"$base/n$n"
      build(spark, srcDir, dir, n)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // bit_xor(xxhash64(struct(*))), NOT count(): Catalyst prunes
      // unexecuted output projections under count(), and tx09 is a
      // pure projection — the regexes would never run (the ChaosSmoke
      // red-gate lesson, r11)
      val res =
        try Right(graft.SparkEntry.queries("tx09_pii_redact")(spark, dir)
          .selectExpr("bit_xor(xxhash64(struct(*))) AS x").collect()(0).getLong(0))
        catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      val dt = (System.nanoTime() - t0) / 1e9
      res match {
        case Right(r) => println(f"N=$n%-8d tx09_pii_redact $dt%8.2fs x=$r%016x")
        case Left(e) => println(f"N=$n%-8d tx09_pii_redact $dt%8.2fs THREW $e")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
