package graft

import graft.imdb.{ImdbDemo, ImdbOracle, ImdbPipeline}

/** The generated IMDb oracles are validated end-to-end by the DuckDB
  * gate; this spec pins the generator mechanics the fixtures don't
  * exercise — literal escaping and the NULL/type rendering rules a
  * future fixture edit could silently trip on.
  */
class ImdbOracleSpec extends SparkSpec {
  import spark.implicits._

  test("valuesCte escapes quotes, types NULLs, and renders exact doubles") {
    val df = Seq(
      (Some("O'Brien's \"title\""), Some(1.5), Some(7)),
      (None: Option[String], None: Option[Double], None: Option[Int]),
    ).toDF("s", "d", "i")
    val cte = ImdbOracle.valuesCte("t", df)
    assert(cte.contains("'O''Brien''s \"title\"'"), cte)
    assert(cte.contains("CAST(NULL AS VARCHAR)"), cte)
    assert(cte.contains("CAST(NULL AS DOUBLE)"), cte)
    assert(cte.contains("CAST(NULL AS INTEGER)"), cte)
    assert(cte.contains("CAST(1.5 AS DOUBLE)"), cte)
    assert(cte.contains("""v("s", "d", "i")"""), cte)
  }

  test("pipeline SQL quotes hyphenated one-hot columns and carries top sets") {
    val tops = ImdbPipeline.TopSets(Seq("nm1"), Seq("nm2"), Seq("nm1"), Seq())
    val sql = ImdbOracle.pipelineSql(
      ImdbOracle.demoInputCtes(ImdbDemo.tables(spark)), Seq("Sci-Fi", "Drama"), tops)
    assert(sql.contains("\"genre_Sci-Fi\""), "hyphenated genre column must be quoted")
    assert(sql.contains("['nm1']") && sql.contains("['nm2']"))
    assert(sql.contains("[]::VARCHAR[]"), "empty top set must render as a typed empty list")
    // dropna must guard every pre-drop column, including the stats
    assert(sql.contains("\"writers_known_titles_mean\" IS NOT NULL"))
  }
}
