package graft.imdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic IMDb-shaped tables at configurable scale,
  * generated distributed (spark.range + column arithmetic — no RNG, no
  * driver-side data), for exercising the fidelity pipeline at real row
  * counts. Value distributions roughly follow the published table
  * stats (SURVEY.md §1.4): sparse ratings, csv crew/genre lists, NULL
  * holes, a few aka rows per title.
  */
object ImdbSynth {

  private val Genres = Seq("Drama", "Comedy", "Action", "Thriller", "Documentary",
    "Horror", "Romance", "Sci-Fi", "Crime", "Adventure", "Animation", "Family",
    "Mystery", "Fantasy", "Biography", "History", "War", "Music", "Sport", "Western")
  private val Types = Seq("movie", "tvMovie", "short", "tvShort", "tvSeries", "video")
  private val Categories = Seq("actor", "actress", "writer", "composer", "editor",
    "director", "producer", "self", "cinematographer")
  private val Professions = Seq("actor", "actress", "writer", "producer", "director",
    "composer", "editor", "miscellaneous")

  /** Cheap deterministic mix of the row id (splitmix-ish constant). */
  private def mix(id: org.apache.spark.sql.Column, salt: Int) =
    pmod(id * lit(2654435761L) + lit(salt * 40503L + 7), lit(1000003L))

  def tables(spark: SparkSession, nTitles: Long = 20000L,
      nPeople: Long = 5000L): ImdbReader.ImdbTables = {
    val t = spark.range(nTitles).toDF("id")
    val p = spark.range(nPeople).toDF("id")

    def genreAt(k: Int) = element_at(
      array(Genres.map(lit): _*), (mix(col("id"), 10 + k) % Genres.size + 1).cast("int"))

    val titleBasics = t.select(
      concat(lit("t"), col("id")).as("tconst"),
      element_at(array(Types.map(lit): _*),
        (mix(col("id"), 1) % Types.size + 1).cast("int")).as("titleType"),
      concat(lit("Title "), col("id")).as("primaryTitle"),
      concat(lit("Original "), col("id")).as("originalTitle"),
      when(mix(col("id"), 2) % 20 === 0, "1").otherwise("0").as("isAdult"),
      when(mix(col("id"), 3) % 25 === 0, lit(null))
        .otherwise((lit(1990) + mix(col("id"), 4) % 37).cast("int")).as("startYear"),
      lit(null).cast("int").as("endYear"),
      when(mix(col("id"), 5) % 15 === 0, lit(null))
        .otherwise((lit(5) + mix(col("id"), 6) % 200).cast("int")).as("runtimeMinutes"),
      when(mix(col("id"), 7) % 30 === 0, lit(null))
        .otherwise(when(mix(col("id"), 8) % 3 === 0,
          concat_ws(",", genreAt(0), genreAt(1), genreAt(2)))
          .when(mix(col("id"), 8) % 3 === 1, concat_ws(",", genreAt(0), genreAt(1)))
          .otherwise(genreAt(0))).as("genres"))

    // ~60% of titles rated; votes long-tailed around the 100 floor
    val titleRatings = t.filter(mix(col("id"), 20) % 5 < 3).select(
      concat(lit("t"), col("id")).as("tconst"),
      round(lit(1.0) + (mix(col("id"), 21) % 90) / 10.0, 1).as("averageRating"),
      (lit(5) + pow(lit(10.0), (mix(col("id"), 22) % 40).cast("double") / 10.0))
        .cast("int").as("numVotes"))

    def personRef(k: Int) = concat(lit("nm"), mix(col("id"), k) % nPeople)

    val titleCrew = t.filter(mix(col("id"), 30) % 10 < 9).select(
      concat(lit("t"), col("id")).as("tconst"),
      when(mix(col("id"), 31) % 8 === 0, lit(null))
        .otherwise(when(mix(col("id"), 32) % 4 === 0,
          concat_ws(",", personRef(33), personRef(34)))
          .otherwise(personRef(33))).as("directors"),
      when(mix(col("id"), 35) % 5 === 0, lit(null))
        .otherwise(when(mix(col("id"), 36) % 3 === 0,
          concat_ws(",", personRef(37), personRef(38), personRef(39)))
          .otherwise(personRef(37))).as("writers"))

    // 0-4 aka rows per title via explode of a sized sequence
    val titleAkas = t.select(col("id"),
        explode(sequence(lit(1), (mix(col("id"), 40) % 5).cast("int"))).as("ord"))
      .select(
        concat(lit("t"), col("id")).as("titleId"),
        col("ord").as("ordering"),
        concat(lit("Aka "), col("id"), lit("-"), col("ord")).as("title"),
        element_at(array(Seq("US", "DE", "FR", "JP", "BR", "IN").map(lit): _*),
          pmod(col("ord") + mix(col("id"), 41), lit(6)).cast("int") + 1).as("region"),
        lit(null).cast("string").as("language"),
        lit(null).cast("string").as("types"),
        lit(null).cast("string").as("attributes"),
        (col("ord") === 1).cast("int").as("isOriginalTitle"))

    // 0-7 principal rows per title
    val titlePrincipals = t.select(col("id"),
        explode(sequence(lit(1), (mix(col("id"), 50) % 8).cast("int"))).as("ord"))
      .select(
        concat(lit("t"), col("id")).as("tconst"),
        col("ord").as("ordering"),
        concat(lit("nm"), pmod(mix(col("id"), 51) + col("ord") * 131, lit(nPeople))).as("nconst"),
        element_at(array(Categories.map(lit): _*),
          pmod(col("ord") + mix(col("id"), 52), lit(Categories.size)).cast("int") + 1).as("category"),
        lit(null).cast("string").as("job"),
        lit(null).cast("string").as("characters"))

    def profAt(k: Int) = element_at(
      array(Professions.map(lit): _*), (mix(col("id"), 60 + k) % Professions.size + 1).cast("int"))

    val nameBasics = p.select(
      concat(lit("nm"), col("id")).as("nconst"),
      concat(lit("Person "), col("id")).as("primaryName"),
      when(mix(col("id"), 61) % 3 === 0, lit(null))
        .otherwise((lit(1920) + mix(col("id"), 62) % 90).cast("int")).as("birthYear"),
      when(mix(col("id"), 63) % 10 === 0,
        (lit(1980) + mix(col("id"), 64) % 45).cast("int"))
        .otherwise(lit(null)).as("deathYear"),
      when(mix(col("id"), 65) % 12 === 0, lit(null))
        .otherwise(concat_ws(",", profAt(0), profAt(1))).as("primaryProfession"),
      when(mix(col("id"), 66) % 9 === 0, lit(null))
        .otherwise(concat_ws(",",
          concat(lit("t"), mix(col("id"), 67) % nTitles),
          concat(lit("t"), mix(col("id"), 68) % nTitles))).as("knownForTitles"))

    ImdbReader.ImdbTables(nameBasics, titleAkas, titleBasics, titleCrew,
      titlePrincipals, titleRatings)
  }
}
