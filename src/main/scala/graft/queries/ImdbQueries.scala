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

  val all: Seq[Q] = Seq(
    Q("imdb_pipeline_demo", imdbPipeline, None),
    Q("imdb_trends_demo", imdbTrends, None),
  )
}
