package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Giant-document scale probe (driver-side tooling): after the
  * duplicate blast (DupBlast) and the hot-key window blast (SkewBlast),
  * the remaining classic crawl pathology is the SINGLE giant document —
  * concatenated logs, minified JS bundles, DNA strings, a book corpus
  * row — hitting the per-document text operators. Every per-doc
  * operator is some composition of tokenize → n-gram/span/window →
  * aggregate, and each composition has a different peak-memory and
  * time shape in the document's token count T:
  *
  *   - streaming shape: `explode(sequence(...))` positions + per-row
  *     `slice` — peak memory O(T) (the token array), time O(T·n);
  *   - materializing shape: `explode(transform(sequence(...), i ->
  *     gram))` — the FULL per-doc n-gram array is one value before
  *     Generate iterates it: peak O(T·n·token_width) on a single row;
  *   - per-doc windows (winnowing, CDC chunk ids, bigrams): a
  *     single-partition sort, linearithmic and spill-safe (the q62
  *     precedent from SkewBlast);
  *   - per-doc/per-chunk `collect_list` reassembly (tx12/tx19/tx20):
  *     one aggregation buffer holding the document.
  *
  * This probe builds sf0.001 + ONE synthetic giant doc of T whitespace
  * tokens (deterministic mixed vocabulary of ~100k lowercase-alnum
  * words, so shingle/BPE/quality gates all see a trainable, shingleable
  * document; fresh id far above the real range, real lang/source) and
  * times the text family at several T, so the wall — if any — is
  * measured rather than argued about. Each T escalation multiplies the
  * corpus token mass ~T/150k-fold: the base corpus is 500 docs of ~50
  * tokens.
  *
  * Usage: runMain graft.tools.GiantDocBlast [T ...]
  *   (default: 0 250000 1000000 — T=0 is the no-giant baseline)
  *   SPARK_GRAFT_SF_DIR  source testdata (default sf0.001)
  */
object GiantDocBlast {

  private val probeQueries = Seq(
    // per-doc projections / stats (tokenize once, aggregate scalars)
    "tx01_token_stats", "tx03_lang_id", "tx05_fingerprint", "tx07_curate",
    // n-gram families (the explode(transform(...)) materializing shape)
    "tx08_contamination", "tx10_repetition", "tx14_bigram_nll",
    "tx18_source_contamination",
    // span tiling + reassembly collect_list, winnowed fingerprints
    "tx12_span_dedup", "tx16_span_novelty", "tx19_span_decontaminate",
    "dd10_passage_overlap",
    // per-doc windows (CDC chunk ids = cumulative sum over positions)
    "tx20_cdc_chunks",
    // distinct-word table consumers (giant doc adds <=100k vocab words)
    "tx15_bpe_apply",
    // shingle inverted-index dedup (giant doc joins the candidate pool)
    "dd02_jaccard_pairs")

  /** Deterministic token stream: ~100k distinct lowercase-alnum words
    * (Knuth multiplicative hash over the position), so the giant doc
    * is NOT boilerplate (DupBlast covers that), trains BPE, passes the
    * `^[a-z0-9]+$` word gate, and yields mostly-distinct shingles —
    * the worst honest case for n-gram volume.
    */
  private[tools] def giantText(tokens: Int): String = {
    val sb = new java.lang.StringBuilder(tokens * 6)
    var i = 0
    while (i < tokens) {
      if (i > 0) sb.append(' ')
      val h = (i.toLong * 2654435761L) & 0x7fffffffL
      sb.append('w').append(java.lang.Long.toString(h % 99991L, 36))
      i += 1
    }
    sb.toString
  }

  def build(spark: SparkSession, srcDir: String, outDir: String, t: Int): Unit = {
    val out = java.nio.file.Paths.get(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
    java.nio.file.Files.createDirectories(out)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings")
      .foreach { tbl =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$srcDir/$tbl.parquet"), out.resolve(s"$tbl.parquet"))
      }
    val docs = graft.Tables.documents(spark, srcDir)
    if (t == 0) {
      docs.coalesce(2).write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    } else {
      // real lang/source so source-keyed queries see a known group; the
      // giant row goes through createDataFrame, NOT lit(text) — a
      // multi-MB literal would bloat every plan string it appears in
      val proto = docs.select(col("lang"), col("source")).head()
      val txt = giantText(t)
      import spark.implicits._
      val giant = Seq((900000L, txt, proto.getString(0), proto.getString(1),
        txt.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.unionByName(giant.select(docs.columns.map(col): _*))
        .coalesce(2).write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ts = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(0, 250000, 1000000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_giantdoc_").toString
    for (t <- ts) {
      val dir = s"$base/t$t"
      build(spark, srcDir, dir, t)
      println(s"== T=$t ==")
      for (name <- probeQueries) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val res =
          try Right(graft.SparkEntry.queries(name)(spark, dir).count())
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}") }
        val dt = (System.nanoTime() - t0) / 1e9
        res match {
          case Right(n) => println(f"$name%-26s $dt%8.2fs rows=$n%d")
          case Left(e) => println(f"$name%-26s $dt%8.2fs THREW $e")
        }
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
