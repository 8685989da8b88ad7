package graft.imdb

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** IMDb TSV ingestion (SURVEY.md §2.1 S1–S3), Spark-first:
  *
  *   - explicit schemas instead of inferSchema — one scan, not two
  *     (reference scripts/data_processing.py:36-42);
  *   - `nullValue="\N"` on the reader instead of six per-column
  *     when/otherwise projection passes (data_processing.py:45-51) —
  *     identical semantics (the reference only scrubbed string
  *     columns, but `\N` in a numeric column already became NULL via
  *     cast failure; SURVEY.md §1.3);
  *   - the post-load casts (data_processing.py:54-64) are subsumed by
  *     the schema types.
  */
object ImdbReader {

  case class ImdbTables(
      nameBasics: DataFrame,
      titleAkas: DataFrame,
      titleBasics: DataFrame,
      titleCrew: DataFrame,
      titlePrincipals: DataFrame,
      titleRatings: DataFrame)

  def readTsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)

  /** Load all six tables from a directory of IMDb dumps —
    * data_processing.py:10-67 in one reader pass each.
    */
  def loadTables(spark: SparkSession, dirname: String = "data"): ImdbTables =
    ImdbTables(
      nameBasics = readTsv(spark, s"$dirname/name.basics.tsv", ImdbSchemas.nameBasics),
      titleAkas = readTsv(spark, s"$dirname/title.akas.tsv", ImdbSchemas.titleAkas),
      titleBasics = readTsv(spark, s"$dirname/title.basics.tsv", ImdbSchemas.titleBasics),
      titleCrew = readTsv(spark, s"$dirname/title.crew.tsv", ImdbSchemas.titleCrew),
      titlePrincipals = readTsv(spark, s"$dirname/title.principals.tsv", ImdbSchemas.titlePrincipals),
      titleRatings = readTsv(spark, s"$dirname/title.ratings.tsv", ImdbSchemas.titleRatings))

  /** Parquet sink (data_processing.py:377-386). */
  def saveParquet(dataset: DataFrame, outputDirname: String = "output",
      mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    dataset.write.mode(mode).parquet(outputDirname)
}
