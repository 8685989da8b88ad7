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

  /** events.parquet's `ts` physical type has drifted across testdata
    * generations: TIMESTAMP(NANOS) (Spark's vectorized reader rejects it
    * unless read as long via the legacy conf) vs plain timestamp[us]
    * (loads as TIMESTAMP_NTZ). Branch on the loaded schema so either
    * arrival normalizes to session-zoned TimestampType — with the UTC
    * session timezone both paths yield the same wall-clock instants the
    * DuckDB oracle sees. Unexpected types fail fast with the table name
    * rather than poisoning every downstream event query.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long arrival: integer divide to micros
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet arrival type $other in $dir")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
