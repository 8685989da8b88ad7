package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key window-skew probe (driver-side tooling): the per-user event
  * analytics family (sessionize, gap-fill, EWMA, rolling, funnel,
  * transitions, interpolation) partitions its windows by `user_id` —
  * BY SEMANTICS, so no salting/AQE can split one user's rows across
  * tasks. At 100 TB a bot/ingest-loop user with tens of millions of
  * events therefore pins one task per query; the question that decides
  * whether that's "a long task" or "a hung job" is whether each
  * operator is linearithmic in the hot partition or quadratic (the
  * q93 UnboundedFollowing class, fixed r11). This probe measures it:
  * sf0.001 plus ONE user with K synthetic events (fresh event_ids,
  * timestamps jittered inside the existing global span so gap-fill
  * spines don't grow, event types cycled through the user's real
  * types), the window family timed at several K. Quadratic shows up
  * as a ~100× step between K and 10K; linearithmic as ~10-12×.
  *
  * Usage: runMain graft.tools.SkewBlast [K ...]   (default: 20000 200000)
  *   SPARK_GRAFT_SF_DIR  source testdata (default sf0.001)
  */
object SkewBlast {

  private val probeQueries = Seq(
    "q62_sessionize", "q60_gapfill", "q89_gap_fill", "q93_interp",
    "q92_ewma", "q68_rolling_window", "q86_transition_matrix",
    "q63_funnel", "q64_cohort_retention", "q83_key_skew")

  def build(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val out = java.nio.file.Paths.get(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
    java.nio.file.Files.createDirectories(out)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$srcDir/$t.parquet"), out.resolve(s"$t.parquet"))
      }
    val events = graft.Tables.events(spark, srcDir)
    val hot = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).count().orderBy(col("count").desc, col("user_id"))
      .limit(1).collect()(0).getLong(0)
    val span = events.agg(
      unix_micros(min(col("ts"))).as("lo"), unix_micros(max(col("ts"))).as("hi"))
      .collect()(0)
    val (lo, hi) = (span.getLong(0), span.getLong(1))
    val types = events.filter(col("user_id") === hot && col("event_type").isNotNull)
      .select(col("event_type")).distinct()
      .orderBy(col("event_type")).as[String](spark.implicits.newStringEncoder)
      .collect()
    // jitter: a fixed odd multiplier mod the span keeps every synthetic
    // instant inside [lo, hi] (no spine growth) while scattering the
    // hot user's rows across the whole window ordering
    val spanUs = math.max(hi - lo, 1L)
    // all-NULL event_type on the hot user (a degenerate-shard shape):
    // cycle NULL rather than divide by a zero modulus under ANSI
    val typeExpr =
      if (types.isEmpty) lit(null).cast("string")
      else element_at(array(types.map(lit): _*),
        (pmod(col("id"), lit(types.length.toLong)) + 1).cast("int"))
    val blast = spark.range(k.toLong).select(
      (col("id") + 900000L).as("event_id"),
      timestamp_micros(lit(lo) + pmod(col("id") * lit(2654435761L), lit(spanUs)))
        .as("ts"),
      lit(hot).as("user_id"),
      typeExpr.as("event_type"),
      (pmod(col("id") * lit(7919L), lit(100000L)) / lit(100.0)).as("value"),
      lit(null).cast("string").as("props"))
    events.unionByName(blast.select(events.columns.map(col): _*))
      .coalesce(4).write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(20000, 200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-run temp base: two concurrent probe runs on one host must
    // not overwrite each other's shard mid-sweep (the ChaosGateSpec
    // lesson, ADVICE r11)
    val base = java.nio.file.Files.createTempDirectory("graft_skewblast_").toString
    for (k <- ks) {
      val dir = s"$base/k$k"
      build(spark, srcDir, dir, k)
      println(s"== K=$k hot-user events ==")
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
