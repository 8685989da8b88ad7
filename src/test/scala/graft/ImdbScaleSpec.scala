package graft

import org.apache.spark.sql.functions._
import graft.imdb.{ImdbPipeline, ImdbSynth}

/** The fidelity pipeline on distributed synthetic data at real row
  * counts (toy fixtures can hide join/agg mistakes that only surface
  * with cardinality).
  */
class ImdbScaleSpec extends SparkSpec {

  test("generateDataset over 10k synthetic titles produces a populated feature table") {
    val t = ImdbSynth.tables(spark, nTitles = 10000L, nPeople = 2000L)
    val ds = ImdbPipeline.generateDataset(t)
    val n = ds.count()
    assert(n > 100, s"only $n rows survived")
    // dropna guarantee: no NULL anywhere in the survivors
    val nullCounts = ds.select(ds.columns.map(c =>
      sum(col(c).isNull.cast("int")).as(c)): _*).first()
    ds.columns.indices.foreach(i => assert(nullCounts.getLong(i) === 0L,
      s"column ${ds.columns(i)} has NULLs"))
    // one-hot coherence: every genre flag is 0/1 and at least one set per row
    val genreCols = ds.columns.filter(_.startsWith("genre_"))
    assert(genreCols.nonEmpty)
    val bad = ds.select(genreCols.map(col): _*)
      .filter(genreCols.map(c => col(c) =!= 0 && col(c) =!= 1).reduce(_ || _))
    assert(bad.count() === 0)
    val rowSums = ds.select(genreCols.map(col).reduce(_ + _).as("s"))
    assert(rowSums.filter(col("s") < 1).count() === 0)
  }

  test("synthetic generator is deterministic across invocations") {
    val a = ImdbSynth.tables(spark, 2000L, 500L).titleBasics
      .agg(sum(crc32(concat_ws("|", col("tconst"), col("genres")))).as("h"))
      .first().getLong(0)
    val b = ImdbSynth.tables(spark, 2000L, 500L).titleBasics
      .agg(sum(crc32(concat_ws("|", col("tconst"), col("genres")))).as("h"))
      .first().getLong(0)
    assert(a === b)
  }

  test("trends at synthetic scale produces a genre×year grid") {
    val t = ImdbSynth.tables(spark, 10000L, 2000L)
    val trends = graft.imdb.ImdbAnalysis.trendsDataFrame(t.titleBasics, t.titleRatings)
    val rows = trends.count()
    assert(rows > 50, s"trends rows $rows")
    val distinctGenres = trends.select("genre").distinct().count()
    assert(distinctGenres > 5)
  }
}
