package graft.imdb

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Tiny in-memory IMDb-shaped dataset (FIXTURES.md §1) for smoke-
  * driving the pipeline without the real dumps: rows exercise NULL csv
  * columns, type/year/runtime boundaries, the numVotes≥100 floor, and
  * the nm123/nm1234 prefix collision behind the rlike fidelity flag.
  */
object ImdbDemo {

  private def df(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  def tables(spark: SparkSession): ImdbReader.ImdbTables = ImdbReader.ImdbTables(
    nameBasics = df(spark, ImdbSchemas.nameBasics, Seq(
      Row("nm1", "Alice Writer", 1970, null, "actor,director", "t1,t2,t3"),
      Row("nm2", "Bob Multi", 1980, null, "writer", "t1"),
      Row("nm123", "Carol Prefix", 1960, 2020, "x,y,z", null),
      Row("nm1234", "Dan Longid", 1990, null, "a", "t1,t2"),
    )),
    titleAkas = df(spark, ImdbSchemas.titleAkas, Seq(
      Row("t1", 1, "A", "US", null, null, null, 1),
      Row("t1", 2, "A-de", "DE", "de", null, null, 0),
      Row("t1", 3, "A-fr", "FR", "fr", null, null, 0),
      Row("t2", 1, "B", "US", null, null, null, 1),
    )),
    titleBasics = df(spark, ImdbSchemas.titleBasics, Seq(
      //  tconst, type,     primary, original, isAdult, start, end, runtime, genres
      Row("t1", "movie", "A", "A", "0", 2010, null, 100, "Drama,Comedy"),
      Row("t2", "movie", "B", "B", "0", 2020, null, 25, "Drama"),
      Row("t3", "movie", "C", "C", "1", 2010, null, 90, "Drama"),      // adult → out
      Row("t4", "tvSeries", "D", "D", "0", 2010, null, 45, "Drama"),   // type → out
      Row("t5", "movie", "E", "E", "0", 1999, null, 90, "Drama"),      // year → out
      Row("t6", "movie", "F", "F", "0", 2010, null, null, "Drama"),    // runtime NULL → out
      Row("t7", "movie", "G", "G", "0", 2012, null, 95, null),         // genres NULL → out
      Row("t8", "movie", "H", "H", "0", 2015, null, 60, "Action"),     // no rating row
      Row("t9", "short", "I", "I", "0", 2018, null, 160, "Comedy"),
    )),
    titleCrew = df(spark, ImdbSchemas.titleCrew, Seq(
      Row("t1", "nm1,nm2", "nm1234"),
      Row("t2", "nm123", null),
      Row("t9", null, "nm2"),
    )),
    titlePrincipals = df(spark, ImdbSchemas.titlePrincipals, Seq(
      Row("t1", 1, "nm10", "actor", null, "[\"Self\"]"),
      Row("t1", 2, "nm11", "actress", null, null),
      Row("t1", 3, "nm2", "writer", null, null),
      Row("t1", 4, "nm12", "composer", null, null),
      Row("t2", 1, "nm10", "actor", null, null),
      Row("t2", 2, "nm13", "actor", null, null),
      Row("t2", 3, "nm14", "editor", null, null),
    )),
    titleRatings = df(spark, ImdbSchemas.titleRatings, Seq(
      Row("t1", 7.5, 150),
      Row("t2", 5.0, 100),   // exactly at the numVotes floor → kept
      Row("t3", 9.0, 1000),  // title filtered out upstream
      Row("t9", 6.0, 200),
      Row("t10", 8.0, 99),   // below floor → out
    )),
  )
}
