package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.text.TextStats

/** Streaming twin of the batch curation pipeline (mx05/mx06): documents
  * arrive as parquet drops with an ingest timestamp and flow through
  * the SAME gate expressions the batch catalog verifies — the stateless
  * gates (quality, repetition) are shared Column logic verbatim, and
  * exact dedup becomes `dropDuplicatesWithinWatermark` on the content
  * fingerprint, trading dd01's global groupBy for watermark-bounded
  * state (unbounded dedup state is the classic streaming OOM).
  *
  * At 100 TB/day this is the ingest-time shape: per-micro-batch work is
  * one narrow projection per gate plus the keyed dedup state lookup;
  * nothing shuffles across batches except the fingerprint state store.
  */
object DocStream {

  /** documents-with-ingest-time schema for the streaming source. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ingest_ts", TimestampType),
    StructField("text", StringType),
    StructField("source", StringType),
  ))

  case class Doc(doc_id: Long, ingest_ts: java.sql.Timestamp, text: String,
      source: String)

  /** File-based streaming source over a directory of parquet drops. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Watermark-bounded streaming curation: exact dedup on the
    * normalized-content fingerprint, then the batch quality gate.
    * Emits curated docs with their scores.
    *
    * Dedup keeps the FIRST-PROCESSED row per fingerprint: duplicates
    * in later micro-batches (within the watermark) are dropped, but
    * when duplicate fingerprints land in the SAME micro-batch the
    * survivor is arbitrary (processing order), not min-doc_id — so
    * WHICH doc survives is deterministic per fingerprint only across
    * batches. A pipeline needing the batch min-id canonical rule
    * should pre-aggregate min(doc_id) per fingerprint per batch via
    * foreachBatch before this dedup.
    */
  def curatedDocs(docs: DataFrame, watermarkDelay: String = "10 minutes",
      minQuality: Double = 0.5): DataFrame =
    docs
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("quality", TextStats.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("ingest_ts"), col("source"),
        round(col("quality"), 4).as("quality"))
}
