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
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    val df = load(spark, dir, "events")
    // Scoped conf: restore the caller's value so a later read of some
    // OTHER nanos-timestamp parquet in the same session fails loudly
    // (or converts) instead of silently arriving as LongType.
    def restore(): Unit = prior match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None    => spark.conf.unset(nanosKey)
    }
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long arrival: integer divide to micros
        // The conf must STAY set on this branch: the parquet footer is
        // re-converted at action time under the then-active session
        // conf, so restoring here would make the returned DataFrame
        // itself fail at its first action.
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        restore()
        // NTZ wall-clocks are UTC by testdata contract, but a bare
        // cast to TimestampType interprets them in the *session* zone
        // — on any non-UTC caller (default spark-shell) every instant
        // silently shifts by the host offset, and the two physical
        // arrivals (nanos = true instants vs NTZ) disagree. Nor is a
        // session-zone round-trip (convert_timezone UTC→sessionTz,
        // then cast) safe: in any DST zone the fall-back overlap hour
        // makes the wall-clock→instant cast ambiguous, and Spark
        // resolves it to the earlier offset — one hour of instants per
        // year silently shifts (pinned by the randomized TablesSpec
        // round-trip, which caught exactly this). Instead reassemble
        // epoch micros arithmetically from the wall-clock fields:
        // every function below is a tz-free field extraction, so the
        // result is exact for any session zone, gaps and overlaps
        // included.
        df.withColumn("ts", expr(
          """timestamp_micros(
            |  cast(unix_date(cast(ts AS date)) AS bigint) * 86400000000 +
            |  cast(extract(HOUR FROM ts) AS bigint) * 3600000000 +
            |  cast(extract(MINUTE FROM ts) AS bigint) * 60000000 +
            |  cast(extract(SECOND FROM ts) * 1000000 AS bigint))""".stripMargin))
      case TimestampType => restore(); df
      case other =>
        restore()
        throw new IllegalStateException(
          s"events.ts: unexpected parquet arrival type $other in $dir")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
