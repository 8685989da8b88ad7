package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table shape. The reference has
  * no streaming surface (SURVEY.md §2.10) — this is the extension a
  * large-scale ingestion pipeline needs, built the Spark-native way:
  * declarative windowed aggregations with watermarks where built-ins
  * suffice, `flatMapGroupsWithState` only for the genuinely custom
  * state machine.
  *
  * Scale posture: every operator here keys state by user/window, so
  * state is hash-partitioned across executors and bounded by the
  * watermark — closed windows are evicted, and the running-totals
  * state machine arms an event-time idle timeout per user; nothing
  * accumulates on the driver.
  */
object EventStream {

  /** events.parquet shape with a proper timestamp (see Tables.events
    * for the TIMESTAMP(NANOS) caveat — a streaming source should feed
    * micros).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** File-based streaming source over a directory of parquet drops. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling/sliding window counts per event type with a watermark:
    * late events beyond `watermarkDelay` are dropped, closed windows
    * are emitted exactly once in append mode.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "5 minutes",
      slide: Option[String] = None, watermarkDelay: String = "10 minutes"): DataFrame = {
    val win = slide.fold(window(col("ts"), windowLen))(s => window(col("ts"), windowLen, s))
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Session windows per user via the built-in session_window (gap
    * closes a session) — compose, don't hand-roll (SURVEY.md §7.3).
    */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("total_value"))

  /** Running per-user totals emitted on every update — the custom
    * state machine built-ins can't express (emit-on-change semantics),
    * via flatMapGroupsWithState. State: (event count, value sum).
    *
    * Running totals have no window to close, so state is bounded by
    * evicting users idle longer than `idleGapMs` of EVENT time: each
    * update arms an event-time timeout at (latest event + gap), and
    * when the watermark passes it the user's state is dropped. Event
    * time (not processing time) keeps eviction deterministic on replay
    * AND keeps test/ops semantics sane — a processing-time timeout
    * makes the engine self-schedule no-data batches forever, which
    * busy-loops `processAllAvailable`. On eviction the final total is
    * emitted once more with `evicted = true`, so a downstream sink can
    * persist it and re-seed on the user's return — without that flush
    * the last total would be silently lost with the state.
    */
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double,
      evicted: Boolean = false)

  def runningUserTotals(events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      idleGapMs: Long = 3600L * 1000): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserTotals](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            // Final flush: emit the last total (flagged) before dropping
            // state so downstream can persist evicted totals.
            val last = state.getOption.map { case (n, v) =>
              UserTotals(userId, n, v, evicted = true)
            }
            state.remove()
            last.iterator
          } else {
            val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
            var n = n0
            var v = v0
            var maxTs = Long.MinValue
            rows.foreach { e =>
              n += 1; v += e.value
              if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
            }
            state.update((n, v))
            // timeout must sit above the current watermark or Spark
            // rejects it; late-arriving batches can have maxTs below it
            state.setTimeoutTimestamp(
              math.max(maxTs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            Iterator(UserTotals(userId, n, v))
          }
      }
  }

  /** Stream-static enrichment join: each micro-batch joins against the
    * static dimension (broadcast by Catalyst when small) — no state, no
    * watermark needed; the static side is re-planned per batch so slow
    * dimension updates are picked up.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String = "event_type"): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream-stream interval join (attribution shape): each `convert`
    * event joins the same user's `trigger` events that happened up to
    * `within` before it. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can compute how
    * long each side's rows stay joinable and evict state past it —
    * the required shape for an unbounded stream-stream join (an
    * unconstrained one accumulates both streams forever).
    *
    * State scales with (events within the interval window) per
    * executor, hash-partitioned by user — no driver accumulation, no
    * full-history state at 100 TB/day rates.
    */
  def attributed(triggers: DataFrame, converts: DataFrame,
      watermarkDelay: String = "10 minutes",
      within: String = "30 minutes"): DataFrame = {
    val trig = triggers
      .select(col("event_id").as("trigger_id"), col("user_id"),
        col("ts").as("trigger_ts"))
      .withWatermark("trigger_ts", watermarkDelay)
    val conv = converts
      .select(col("event_id").as("convert_id"), col("user_id").as("c_user_id"),
        col("ts").as("convert_ts"), col("value"))
      .withWatermark("convert_ts", watermarkDelay)
    trig.join(conv,
      col("user_id") === col("c_user_id")
        && col("convert_ts") >= col("trigger_ts")
        && col("convert_ts") <= col("trigger_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("trigger_id"), col("convert_id"),
        col("trigger_ts"), col("convert_ts"), col("value"))
  }

  /** Streaming daily-active-users: the stream twin of q107's DAU
    * column. Distinct-per-day is the (user, day) dedup — state bounded
    * by the watermark, NOT an unbounded distinct aggregate — followed
    * by a 1-day tumbling-window count of the deduped survivors. Append
    * mode emits each day exactly once when the watermark passes its
    * close; at 100 TB/day the dedup state holds one row per active
    * (user, day) inside the watermark horizon, the same cardinality
    * the batch query shuffles.
    */
  def dailyActiveUsers(events: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("day", date_trunc("day", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(col("window.start").as("day"), col("dau"))

  /** Streaming exactly-once dedup by event_id bounded by the watermark:
    * duplicates arriving within the watermark window are dropped, state
    * for ids older than the watermark is evicted (unbounded dedup state
    * is the classic streaming OOM).
    */
  def dedupedEvents(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Idempotent micro-batch sink: foreachBatch + dynamic partition
    * overwrite, the exactly-once pattern for non-transactional stores.
    * The update-mode aggregate re-emits a key's latest value each
    * batch; writing it with dynamic partitionOverwriteMode replaces
    * exactly the partitions present in the batch, so a replayed batch
    * (failure between write and checkpoint commit) rewrites the same
    * partitions instead of appending duplicates. At scale this is the
    * standard sink shape for parquet/object-store targets: idempotence
    * comes from keyed overwrite, not sink transactions.
    */
  def upsertToParquet(agg: DataFrame, partitionCol: String, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-write option, NOT a session conf: setting
        // spark.sql.sources.partitionOverwriteMode session-wide here
        // would silently turn every later batch overwrite in the same
        // session into a partial (dynamic) overwrite — the same
        // leaked-conf class as the events loader's nanosAsLong
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol).parquet(path)
      }
      .start()

  /** Synchronous drain into an in-memory table for tests/smoke: starts
    * the query, processes everything available, returns the query name
    * to SELECT from.
    */
  def runToMemory(df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
