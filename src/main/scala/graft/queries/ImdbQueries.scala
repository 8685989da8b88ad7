package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.imdb.{ImdbAnalysis, ImdbDemo, ImdbOracle, ImdbPipeline, ImdbSynth}

/** Driver-visible entries for the IMDb-fidelity pipeline — the demo
  * fixtures and the 30k-title synthetic scale run (the sf dir argument
  * is unused: the real inputs are IMDb dumps, not the star schema).
  *
  * All three now carry generated DuckDB oracles (ImdbOracle): the demo
  * fixtures are inlined as VALUES, the synth inputs re-derived with the
  * same splitmix arithmetic, and each pipeline run's collected top-N id
  * sets are interpolated into its oracle. The run is memoized per
  * SparkSession (r4 advice pattern) so the query fn and its oracle
  * generator see one execution — the oracle must describe the exact
  * lists the dumped result used.
  */
object ImdbQueries {

  private val runCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, ImdbPipeline.TopSets)]

  /** Drop the memoized pipeline runs so the next call re-executes from
    * the inputs. Bench-only (Catalog.clearMemos): repeated timing of
    * the pipeline queries must measure the pipeline, not a map lookup.
    * Verify must NOT call this — its oracle generators describe the
    * exact memoized run the dumped result came from.
    */
  private[queries] def clearMemo(): Unit = runCache.clear()

  private def demoRun(s: SparkSession): (DataFrame, ImdbPipeline.TopSets) =
    runCache.getOrElseUpdate((s, "demo"),
      ImdbPipeline.generateDatasetWithTops(ImdbDemo.tables(s)))

  private def synthRun(s: SparkSession): (DataFrame, ImdbPipeline.TopSets) =
    runCache.getOrElseUpdate((s, "synth"),
      ImdbPipeline.generateDatasetWithTops(ImdbSynth.tables(s, 30000L, 6000L)))

  /** The one-hot genre schema the run collected, recovered from the
    * result's columns (initialForm's single plan-data dependency).
    */
  private def genresOf(result: DataFrame): Seq[String] =
    result.columns.toSeq.filter(_.startsWith("genre_")).map(_.stripPrefix("genre_"))

  private def activeSession: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "IMDb oracle generation needs an active SparkSession"))

  private def imdbPipeline(s: SparkSession, dir: String): DataFrame =
    demoRun(s)._1.orderBy(col("primaryTitle"))

  private def imdbTrends(s: SparkSession, dir: String): DataFrame = {
    val t = ImdbDemo.tables(s)
    ImdbAnalysis.trendsDataFrame(t.titleBasics, t.titleRatings)
      .orderBy(col("genre"), col("startYear"))
  }

  /** The flagship ETL at synthetic scale (30k titles / 6k people,
    * generated distributed) — measures the real 8-join + 4-ranking
    * pipeline in the bench, not a toy fixture.
    */
  private def imdbPipelineSynth(s: SparkSession, dir: String): DataFrame =
    synthRun(s)._1.orderBy(col("primaryTitle"))

  val all: Seq[Q] = Seq(
    Q("imdb_pipeline_demo", imdbPipeline, None, Some(() => {
      val (res, tops) = demoRun(activeSession)
      ImdbOracle.pipelineSql(
        ImdbOracle.demoInputCtes(ImdbDemo.tables(activeSession)), genresOf(res), tops)
    })),
    Q("imdb_trends_demo", imdbTrends, None, Some(() => {
      val t = ImdbDemo.tables(activeSession)
      ImdbOracle.trendsSql(t.titleBasics, t.titleRatings)
    })),
    Q("imdb_pipeline_synth", imdbPipelineSynth, None, Some(() => {
      val (res, tops) = synthRun(activeSession)
      ImdbOracle.pipelineSql(ImdbOracle.synthInputCtes(30000L, 6000L), genresOf(res), tops)
    })),
  )
}
