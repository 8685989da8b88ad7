package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.imdb.{ImdbAnalysis, ImdbDemo, ImdbPipeline}

/** Driver-visible smoke of the IMDb-fidelity pipeline on the in-memory
  * demo tables (the sf dir argument is unused — the real inputs are
  * IMDb dumps, not the star schema). Values are asserted in ImdbSpec;
  * here the driver sees rows>0 through the same entry point a
  * reference user would call.
  */
object ImdbQueries {

  private def imdbPipeline(s: SparkSession, dir: String): DataFrame =
    ImdbPipeline.generateDataset(ImdbDemo.tables(s))

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
    ImdbPipeline.generateDataset(graft.imdb.ImdbSynth.tables(s, 30000L, 6000L))

  val all: Seq[Q] = Seq(
    Q("imdb_pipeline_demo", imdbPipeline, None),
    Q("imdb_trends_demo", imdbTrends, None),
    Q("imdb_pipeline_synth", imdbPipelineSynth, None),
  )
}
