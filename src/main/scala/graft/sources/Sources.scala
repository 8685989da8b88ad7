package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** General source/sink surface beyond the IMDb TSV reader
  * (graft.imdb.ImdbReader) and the plain parquet loaders
  * (graft.Tables): JSON lines, ORC, and partitioned/pruned parquet
  * layouts.
  *
  * Scale posture: every reader takes an explicit schema (no
  * inferSchema double scan — the same decision SURVEY.md §1.2 makes
  * for the TSVs); [[writePartitionedParquet]] is the layout that turns
  * a date/tenant predicate into directory-level partition pruning at
  * 100 TB (the scan never lists, let alone reads, non-matching
  * partitions).
  */
object Sources {

  /** JSON-lines reader with a required explicit schema. Malformed rows
    * land in NULLs (PERMISSIVE) rather than failing the 100-TB job.
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC round-trip (columnar alternative when the lake standard is
    * ORC, not parquet; same vectorized reader + predicate pushdown).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-style partitioned parquet layout: one directory per distinct
    * value combination of `partitionCols`. Filters on those columns
    * prune at the directory level (visible as PartitionFilters in the
    * physical scan), so a day-slice query over years of data touches
    * only that day's files.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readPartitionedParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
