package graft.imdb

import org.apache.spark.sql.types._

/** Explicit schemas for the six IMDb tables — replaces the reference's
  * inferSchema double scan (scripts/data_processing.py:36-42; SURVEY.md
  * §1.2). Types match the reference's *inferred* ones (FIXTURES.md §1),
  * including the `isAdult: string` quirk it depends on
  * (data_processing.py:104 compares it to 0 via implicit cast).
  */
object ImdbSchemas {

  val nameBasics: StructType = StructType(Seq(
    StructField("nconst", StringType),
    StructField("primaryName", StringType),
    StructField("birthYear", IntegerType),
    StructField("deathYear", IntegerType),
    StructField("primaryProfession", StringType), // csv
    StructField("knownForTitles", StringType),    // csv
  ))

  val titleAkas: StructType = StructType(Seq(
    StructField("titleId", StringType),
    StructField("ordering", IntegerType),
    StructField("title", StringType),
    StructField("region", StringType),
    StructField("language", StringType),
    StructField("types", StringType),
    StructField("attributes", StringType),
    StructField("isOriginalTitle", IntegerType),
  ))

  val titleBasics: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("titleType", StringType),
    StructField("primaryTitle", StringType),
    StructField("originalTitle", StringType),
    StructField("isAdult", StringType), // sic — inferred string in the reference
    StructField("startYear", IntegerType),
    StructField("endYear", IntegerType),
    StructField("runtimeMinutes", IntegerType),
    StructField("genres", StringType),  // csv
  ))

  val titleCrew: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("directors", StringType), // csv of nconst
    StructField("writers", StringType),   // csv of nconst
  ))

  val titlePrincipals: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("ordering", IntegerType),
    StructField("nconst", StringType),
    StructField("category", StringType),
    StructField("job", StringType),
    StructField("characters", StringType), // JSON-ish, never parsed (SURVEY.md §1.3)
  ))

  val titleRatings: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("averageRating", DoubleType),
    StructField("numVotes", IntegerType),
  ))

  /** table file stem → schema, as laid out in the IMDb dumps. */
  val all: Map[String, StructType] = Map(
    "name.basics" -> nameBasics,
    "title.akas" -> titleAkas,
    "title.basics" -> titleBasics,
    "title.crew" -> titleCrew,
    "title.principals" -> titlePrincipals,
    "title.ratings" -> titleRatings,
  )
}
