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
  * Image decode is REAL (javax.imageio → 8-bit luminance); audio/video
  * decode is stubbed — no such codecs ship with a stock JVM — via
  * [[decodeStub]], a deterministic fake derived from bytes + metadata.
  * Every seam a codec plugs into is typed and tested: schema, partition
  * processing, batch iteration, feature output shape, frame sampling,
  * and hash-based cross-media dedup.
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

  private def md5HexStr(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** First 24 bits of md5(seed) as an int — the per-id size/shape
    * derivation shared with the DuckDB oracle (MultimodalQueries).
    */
  private def u24(seed: String): Int =
    Integer.parseInt(md5HexStr(seed).substring(0, 6), 16)

  /** Deterministic synthetic media — stands in for a real blob store;
    * every field derives from media_id through md5, no RNG (r4 advice:
    * scala.util.Random made the features unverifiable). The blob is the
    * UTF-8 bytes of a concatenated-md5 hex string: still an opaque
    * `binary` column through all the plumbing, but reproducible in
    * ANSI SQL (DuckDB's md5() hashes VARCHAR only, so a raw-byte blob
    * could never be oracle-checked end-to-end).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 256 + u24(s"$id:len") % 768
      val stream = (0 until (len + 31) / 32).map(b => md5HexStr(s"$id:$b")).mkString
      Media(id, kind, stream.substring(0, len).getBytes("UTF-8"),
        16 + u24(s"$id:w") % 48, 16 + u24(s"$id:h") % 48,
        1000L + u24(s"$id:d") % 60000)
    }
  }

  /** THE STUB SEAM for video (no video codec on a stock JVM): a real
    * implementation would invoke ffmpeg-style bindings here. The fake
    * is a deterministic function of the bytes so downstream plumbing is
    * fully testable. Audio/image blobs whose bytes no installed reader
    * accepts also land here.
    */
  private[multimodal] def decodeStub(m: Media): Array[Byte] =
    m.content.take(math.min(m.content.length, m.width * m.height))

  /** REAL audio decode via javax.sound.sampled (WAV/AIFF/AU readers
    * ship with every stock JVM): PCM frames → 8-bit unsigned samples of
    * the FIRST channel (16-bit samples keep their high byte; signed
    * values shift to the 0–255 plane by +128 — the audio analogue of
    * the image path's 8-bit luminance). Returns None for bytes no
    * installed reader understands (the synthetic md5-hex blobs, real
    * compressed formats) — caller falls back to [[decodeStub]].
    */
  private[multimodal] def decodeAudio(m: Media): Option[Array[Byte]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      try {
        val f = ais.getFormat
        val enc = f.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bytesPerSample = f.getSampleSizeInBits / 8
        // getFrameSize may be AudioSystem.NOT_SPECIFIED (-1); dividing
        // by it would throw instead of falling back to the stub
        if ((!signed && !unsigned) || (bytesPerSample != 1 && bytesPerSample != 2)
            || f.getFrameSize <= 0) None
        else {
          val raw = ais.readAllBytes()
          val frameSize = f.getFrameSize
          val nFrames = raw.length / frameSize
          val out = new Array[Byte](nFrames)
          val hiOff = if (f.isBigEndian || bytesPerSample == 1) 0 else 1
          var i = 0
          while (i < nFrames) {
            val hi = raw(i * frameSize + hiOff)
            out(i) = if (signed) (hi + 128).toByte else hi
            i += 1
          }
          Some(out)
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Decode a blob to a flat byte plane. Images go through a REAL codec
    * — javax.imageio ships with every stock JVM — to row-major 8-bit
    * luminance (Rec.601 integer weights); audio through the REAL
    * javax.sound.sampled readers ([[decodeAudio]]) to 8-bit
    * first-channel samples; bytes no installed reader understands, and
    * the video kind, fall back to [[decodeStub]].
    */
  def decode(m: Media): Array[Byte] =
    if (m.kind == "audio") decodeAudio(m).getOrElse(decodeStub(m))
    else if (m.kind == "image") {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
        if (img == null) decodeStub(m)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(i) = ((((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000).toByte
              i += 1
              x += 1
            }
            y += 1
          }
          out
        }
      } catch { case _: java.io.IOException => decodeStub(m) }
    } else decodeStub(m)

  /** Per-blob features, computed partition-at-a-time (one pass over
    * each blob, no driver round-trip). Entropy/mean are real byte
    * statistics; content_hash is the cross-media dedup key.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val decoded = decode(m)
        val counts = new Array[Long](256)
        var sum = 0L
        decoded.foreach { b => val u = b & 0xff; counts(u) += 1; sum += u }
        val n = decoded.length.toDouble
        val entropy = counts.filter(_ > 0).map { c =>
          val p = c / n; -p * math.log(p) / math.log(2)
        }.sum
        md.reset()
        val hash = md.digest(m.content).map("%02x".format(_)).mkString
        // empty blob → defined zeros, not a NaN mean (0/0.0 in plain
        // Scala is NaN, and NaN would outrank every number in a later
        // mean_byte ordering/filter — same class as the cosine guard)
        val mean = if (decoded.isEmpty) 0.0 else sum / n
        MediaFeatures(m.media_id, m.kind, m.content.length, mean, entropy, hash)
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
