package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 90)

  test("synthetic media is deterministic and schema-complete") {
    val a = media.collect().sortBy(_.media_id)
    val b = Multimodal.syntheticMedia(spark, 90).collect().sortBy(_.media_id)
    assert(a.length === 90)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.content.sameElements(y.content) })
    assert(media.toDF().schema.fieldNames.toSeq ===
      Multimodal.mediaSchema.fieldNames.toSeq)
  }

  test("feature extraction: one row per blob, sane statistics, stable hash") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 90)
    feats.foreach { f =>
      assert(f.mean_byte >= 0 && f.mean_byte <= 255, s"mean ${f.mean_byte}")
      assert(f.byte_entropy >= 0 && f.byte_entropy <= 8, s"entropy ${f.byte_entropy}")
      assert(f.content_hash.length === 32)
      assert(f.n_bytes >= 256 && f.n_bytes < 1024)
    }
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.sortBy(_.media_id).map(_.content_hash).toSeq ===
      again.sortBy(_.media_id).map(_.content_hash).toSeq)
  }

  test("frame sampling: only video rows, every-Nth chunks, generator cardinality") {
    val frames = Multimodal.sampleFrames(media, frameSize = 64, everyNth = 4)
    val byMedia = frames.collect().groupBy(_.media_id)
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(byMedia.keySet.subsetOf(videoIds))
    assert(byMedia.nonEmpty)
    byMedia.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 4 === 0))
      assert(fs.map(_.frame_idx).distinct.length === fs.length)
    }
    // cardinality: ceil(len/64) chunks → every 4th kept
    val m0 = media.filter(_.kind == "video").collect().minBy(_.media_id)
    val expected = (0 until (m0.content.length + 63) / 64).count(_ % 4 == 0)
    assert(byMedia(m0.media_id).length === expected)
  }

  test("hash dedup groups identical blobs") {
    val dupped = media.union(media.filter(_.media_id < 5)) // re-add 5 dups
    val groups = Multimodal.dedupByHash(Multimodal.extractFeatures(dupped))
    assert(groups.filter($"n_copies" === 2).count() === 5)
    assert(groups.count() === 90)
  }

  test("real image decode: javax.imageio PNG round-trip to luminance plane") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, ((x * 60) << 16) | ((y * 100) << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val decoded = Multimodal.decode(Multimodal.Media(0L, "image", png, 4, 2, 0L))
    assert(decoded.length === 8) // real w*h from the codec, not metadata
    val expected = for (y <- 0 until 2; x <- 0 until 4)
      yield (((x * 60) * 299 + (y * 100) * 587 + 30 * 114) / 1000).toByte
    assert(decoded.toSeq === expected)
    // undecodable bytes and non-image kinds fall back to the stub
    // (the stub is content.take(min(len, width*height)))
    val junkBytes = "not an image".getBytes
    val junk = Multimodal.Media(1L, "image", junkBytes, 3, 4, 0L)
    assert(Multimodal.decode(junk).toSeq === junkBytes.take(12).toSeq)
    val audio = Multimodal.Media(2L, "audio", png, 4, 2, 0L)
    assert(Multimodal.decode(audio).toSeq === png.take(8).toSeq)
  }

  test("real audio decode: javax.sound.sampled WAV round-trip to 8-bit samples") {
    import javax.sound.sampled._
    def wavBytes(samples: Array[Short], channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, channels, true, false) // signed little-endian
      val raw = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt,
        samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // mono: every sample's high byte, shifted to unsigned
    val mono = Array[Short](0, 1000, -1000, 32767, -32768, 256)
    val decoded = Multimodal.decode(
      Multimodal.Media(3L, "audio", wavBytes(mono, 1), 0, 0, 0L))
    assert(decoded.toSeq === mono.map(s => ((s >> 8) + 128).toByte).toSeq)
    // stereo: first channel only (frame = [L lo, L hi, R lo, R hi])
    val stereo = Array[Short](1000, 9999, -1000, -9999) // frames: (1000,9999), (-1000,-9999)
    val decoded2 = Multimodal.decode(
      Multimodal.Media(4L, "audio", wavBytes(stereo, 2), 0, 0, 0L))
    assert(decoded2.toSeq === Seq(((1000 >> 8) + 128).toByte, ((-1000 >> 8) + 128).toByte))
  }

  test("processing distributes: partition count preserved through mapPartitions") {
    val parts = media.repartition(6)
    assert(Multimodal.extractFeatures(parts).rdd.getNumPartitions === 6)
  }
}
