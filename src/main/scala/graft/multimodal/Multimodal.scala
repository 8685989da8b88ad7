package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, processed
  * per-partition so blobs stream through executors without ever
  * collecting. (In PySpark this layer would be mapInPandas batches; the
  * Scala-native equivalent is typed mapPartitions over case classes —
  * same batch shape, same distribution story.)
  *
  * DECODE IS STUBBED: this container ships no image/audio codecs, so
  * [[decodeStub]] derives a deterministic fake "decoded frame" from the
  * bytes + metadata. Every seam a real codec would plug into is typed
  * and tested: schema, partition processing, batch iteration, feature
  * output shape, frame sampling, and hash-based cross-media dedup.
  */
object Multimodal {

  /** media table: one blob + metadata per row. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("content", BinaryType),   // opaque encoded bytes
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
  ))

  final case class Media(media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, byte_entropy: Double, content_hash: String)

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media (seeded per id) — stands in for a
    * real blob store; blob length and bytes derive from media_id only.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val rnd = new scala.util.Random(id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 256 + rnd.nextInt(768)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      Media(id, kind, bytes, 16 + rnd.nextInt(48), 16 + rnd.nextInt(48),
        1000L + rnd.nextInt(60000))
    }
  }

  /** THE STUB SEAM: a real implementation would invoke an image/audio
    * codec here (e.g. javax.imageio / ffmpeg bindings) and return
    * decoded pixels/samples. The fake is a deterministic function of
    * the bytes so downstream plumbing is fully testable.
    */
  private[multimodal] def decodeStub(m: Media): Array[Byte] =
    // ??? ← codec call goes here; deterministic fake instead:
    m.content.take(math.min(m.content.length, m.width * m.height))

  /** Per-blob features, computed partition-at-a-time (one pass over
    * each blob, no driver round-trip). Entropy/mean are real byte
    * statistics; content_hash is the cross-media dedup key.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val decoded = decodeStub(m)
        val counts = new Array[Long](256)
        var sum = 0L
        decoded.foreach { b => val u = b & 0xff; counts(u) += 1; sum += u }
        val n = decoded.length.toDouble
        val entropy = counts.filter(_ > 0).map { c =>
          val p = c / n; -p * math.log(p) / math.log(2)
        }.sum
        md.reset()
        val hash = md.digest(m.content).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.content.length, sum / n, entropy, hash)
      }
    }
  }

  /** Frame sampling for video blobs: split the byte stream into
    * fixed-size pseudo-frames, keep every Nth — the generator-shaped
    * op (one row in, many out) done with typed flatMap.
    */
  def sampleFrames(media: Dataset[Media], frameSize: Int = 64,
      everyNth: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.content.grouped(frameSize).zipWithIndex.collect {
        case (chunk, idx) if idx % everyNth == 0 => Frame(m.media_id, idx, chunk)
      }
    }
  }

  /** Exact cross-media dedup on content hash — same shape as
    * graft.dedup.Dedup.exactGroups but keyed on binary content.
    */
  def dedupByHash(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("content_hash"))
      .agg(min(col("media_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
}
