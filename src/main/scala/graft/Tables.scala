package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the testdata star schema (TESTDATA.md). One parquet file
  * per table under the given scale-factor directory. Parquet scans are
  * vectorized + column-pruned by Spark; callers select early so the
  * pruning reaches the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read
    * nanos as long (legacy conf) and rebuild a proper TimestampType
    * column via integer division to micros — no double round-trip,
    * which would lose precision above 2^53 ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
