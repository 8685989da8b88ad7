package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Driver-visible smoke of the multimodal plumbing on deterministic
  * synthetic blobs (no media in the testdata; decode is stubbed —
  * see graft.multimodal.Multimodal). Rows-only: binary features are
  * not ANSI-SQL territory. Values asserted in MultimodalSpec.
  */
object MultimodalQueries {

  private def mm01Features(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 300)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_byte"),
        round(col("byte_entropy"), 4).as("byte_entropy"), col("content_hash"))
      .orderBy(col("media_id"))

  private def mm02Frames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.syntheticMedia(s, 300)).toDF()
      .select(col("media_id"), col("frame_idx"), length(col("frame_bytes")).as("n_bytes"))
      .orderBy(col("media_id"), col("frame_idx"))

  val all: Seq[Q] = Seq(
    Q("mm01_media_features", mm01Features, None),
    Q("mm02_frame_sample", mm02Frames, None),
  )
}
