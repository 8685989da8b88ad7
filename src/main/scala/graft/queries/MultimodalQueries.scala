package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Driver-visible smoke of the multimodal plumbing on deterministic
  * synthetic blobs (no media in the testdata). The blobs are md5-hex
  * ASCII streams (Multimodal.syntheticMedia), so every feature —
  * lengths, byte stats, entropy, even md5 content hashes — is
  * reproducible in DuckDB SQL and both queries carry full oracles.
  * Image decode attempts a real javax.imageio read first; the hex
  * streams match no installed reader, so features fall back to the
  * deterministic stub the oracle mirrors.
  */
object MultimodalQueries {

  private val N = 300

  private def mm01Features(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.syntheticMedia(s, N)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_byte"),
        round(col("byte_entropy"), 4).as("byte_entropy"), col("content_hash"))
      .orderBy(col("media_id"))

  private def mm02Frames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.syntheticMedia(s, N)).toDF()
      .select(col("media_id"), col("frame_idx"), length(col("frame_bytes")).as("n_bytes"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** First 24 bits of an md5 hex string as an integer — SQL mirror of
    * Multimodal.u24 (six hex digits positionally decoded).
    */
  private def u24(md5Expr: String): String =
    (0 until 6).map { j =>
      val w = math.pow(16, 5 - j).toLong
      s"$w * (strpos('0123456789abcdef', substr($md5Expr, ${j + 1}, 1)) - 1)"
    }.mkString("(", " + ", ")")

  /** Shared seed CTE: per-id kind + derived sizes, exactly as
    * syntheticMedia computes them.
    */
  private def seedsCte: String =
    s"""seeds AS (
       |  SELECT id,
       |    ['image', 'audio', 'video'][CAST(id % 3 AS INTEGER) + 1] AS kind,
       |    256 + ${u24("md5(id || ':len')")} % 768 AS len,
       |    16 + ${u24("md5(id || ':w')")} % 48 AS w,
       |    16 + ${u24("md5(id || ':h')")} % 48 AS h
       |  FROM range($N) t(id))""".stripMargin

  /** mm01: rebuild each blob's hex stream (≤32 md5 blocks), take the
    * stub-decoded prefix min(len, w*h), and aggregate char statistics.
    * The blob IS the hex string's bytes, so mean/entropy are over
    * ascii() codes and content_hash is DuckDB's own md5 of the prefix.
    */
  private def mm01Sql: String =
    s"""WITH
       |$seedsCte,
       |streams AS (
       |  SELECT s.id, string_agg(md5(s.id || ':' || r.b), '' ORDER BY r.b) AS hx
       |  FROM seeds s, range(32) r(b)
       |  WHERE r.b < (s.len + 31) // 32
       |  GROUP BY s.id),
       |blobs AS (
       |  SELECT s.id, s.kind, s.len, least(s.len, s.w * s.h) AS dlen,
       |    substr(st.hx, 1, CAST(s.len AS INTEGER)) AS content
       |  FROM seeds s JOIN streams st ON s.id = st.id),
       |chars AS (
       |  SELECT b.id, ascii(substr(b.content, CAST(r.i AS INTEGER) + 1, 1)) AS v
       |  FROM blobs b, range(4096) r(i)
       |  WHERE r.i < b.dlen),
       |cnts AS (
       |  SELECT id, v, count(*) AS c FROM chars GROUP BY 1, 2),
       |stats AS (
       |  SELECT c.id,
       |    sum(c.c * c.v) / CAST(b.dlen AS DOUBLE) AS mean_raw,
       |    sum(-(c.c / CAST(b.dlen AS DOUBLE)) * ln(c.c / CAST(b.dlen AS DOUBLE)) / ln(2)) AS ent_raw
       |  FROM cnts c JOIN blobs b ON c.id = b.id
       |  GROUP BY c.id, b.dlen)
       |SELECT b.id AS media_id, b.kind, CAST(b.len AS INTEGER) AS n_bytes,
       |  round(st.mean_raw, 4) AS mean_byte,
       |  round(st.ent_raw, 4) AS byte_entropy,
       |  md5(b.content) AS content_hash
       |FROM blobs b JOIN stats st ON b.id = st.id
       |ORDER BY media_id""".stripMargin

  /** mm02: frame cardinality/sizes need only each video blob's length —
    * 64-char chunks, every 4th kept, last chunk ragged.
    */
  private def mm02Sql: String =
    s"""WITH
       |$seedsCte
       |SELECT id AS media_id, CAST(f AS INTEGER) AS frame_idx,
       |  CAST(least(64, len - f * 64) AS INTEGER) AS n_bytes
       |FROM seeds, range(16) r(f)
       |WHERE kind = 'video' AND f * 64 < len AND f % 4 = 0
       |ORDER BY media_id, frame_idx""".stripMargin

  /** Cross-media exact dedup on content hash: the corpus plus a
    * re-added slice (ids < 20) so duplicate groups actually form.
    */
  private def mm03Dedup(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, N)
    val withDups = media.union(media.filter(_.media_id < 20))
    Multimodal.dedupByHash(Multimodal.extractFeatures(withDups))
      .orderBy(col("content_hash"))
  }

  /** Every blob's bytes differ (per-id md5 streams), so each group is
    * its own blob: canonical_id = id, n_copies = 2 for the re-added
    * slice. The hash itself is recomputed from the stream.
    */
  private def mm03Sql: String =
    s"""WITH
       |$seedsCte,
       |streams AS (
       |  SELECT s.id, string_agg(md5(s.id || ':' || r.b), '' ORDER BY r.b) AS hx
       |  FROM seeds s, range(32) r(b)
       |  WHERE r.b < (s.len + 31) // 32
       |  GROUP BY s.id)
       |SELECT md5(substr(st.hx, 1, CAST(s.len AS INTEGER))) AS content_hash,
       |  s.id AS canonical_id,
       |  CAST(CASE WHEN s.id < 20 THEN 2 ELSE 1 END AS BIGINT) AS n_copies
       |FROM seeds s JOIN streams st USING (id)
       |ORDER BY content_hash""".stripMargin

  val all: Seq[Q] = Seq(
    Q("mm01_media_features", mm01Features, Some(mm01Sql)),
    Q("mm02_frame_sample", mm02Frames, Some(mm02Sql)),
    Q("mm03_media_dedup", mm03Dedup, Some(mm03Sql)),
  )
}
