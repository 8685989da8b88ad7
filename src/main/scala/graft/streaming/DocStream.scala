package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
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

  /** The production NEAR-DUP ingest loop — dd16's streaming twin: each
    * micro-batch first dedups WITHIN itself (MinHash-LSH candidates →
    * exact-Jaccard verify → canonical keep, `Dedup.minHashCuratedCorpus`),
    * then against every document accepted so far (`Dedup.
    * minHashDedupAgainstCorpus` over the persisted corpus store), and
    * the survivors append to BOTH the curated output and the store —
    * so batch N+1 dedups against the seed corpus plus batches 1..N.
    *
    * foreachBatch is the right tool, not a built-in stateful operator:
    * the corpus store is read-modify-write state keyed by CONTENT
    * similarity (band joins + verification), which no streaming state
    * store expresses — and the store must also serve batch consumers.
    *
    * Idempotence on replay: each batch writes `batch=<id>`
    * subdirectories with overwrite, so a retried micro-batch rewrites
    * its own partition instead of duplicating it (the checkpoint's
    * batch ids are the exactly-once anchor). Seed the store by placing
    * the existing corpus under `<corpusDir>/batch=seed/`.
    *
    * Scale: per micro-batch cost is dd16's — the batch side band-joins
    * the store's signatures; nothing is ever all-pairs. For a large
    * store, persist signatures instead of re-deriving (the signature
    * columns are deterministic md5 arithmetic, so either side can be
    * precomputed); this loop recomputes them for plumbing simplicity
    * at test scale and documents the seam.
    */
  /** `starCapBucketSize` (default off): a LIVE boilerplate flood — the
    * same page body with per-request mutations arriving thousands of
    * times inside one micro-batch — is the streaming face of the
    * NearDupBlast pathology, and a single O(K²) batch stalls the whole
    * query (micro-batches are sequential). See
    * [[graft.dedup.Dedup.minHashCandidatePairs]] for the contract.
    *
    * `corpusBucketCap` (ADVICE r14): the cross-store arm's per-bucket
    * member cap ([[graft.dedup.Dedup.minHashDedupAgainstCorpus]]) is a
    * DIFFERENT recall/cost trade-off from the within-batch star cap —
    * batch candidate pressure scales with micro-batch size, store
    * pressure with the accumulated corpus — so the two are tunable
    * independently. Defaults to `starCapBucketSize` (the r14 coupling,
    * kept as the default because one knob is the right ergonomics when
    * both floods share a boilerplate family).
    *
    * `seed` (VERDICT r15 #3): the MinHash banding seed, threaded to
    * BOTH dedup arms. The cap family's one approximation class — a
    * giant MIXED band bucket — requires the adversary to know the
    * banding seed (DedupSpec's rotated-seed counterproof: rotating it
    * collapses the constructed dominator and restores capped = exact
    * on the adversarial corpus itself), and this long-lived ingest
    * loop is exactly the surface where an adversary gets repeated
    * shots at a fixed seed. A production deployment should rotate it
    * per corpus; the default stays 42L so existing stores and the
    * batch catalog are untouched. Both arms MUST share one seed per
    * store lifetime — the store holds raw text, so a rotation applies
    * from the next cold start, not mid-stream (signatures are derived
    * per batch, never persisted here). That lifetime rule is ENFORCED,
    * not just documented: see [[checkOrWriteSeedMarker]] — the store
    * carries a `_seed.json` marker and a warm open under a different
    * seed fails the query with an attributed message.
    */
  def incrementalNearDupIngest(docs: DataFrame, corpusDir: String,
      outDir: String, checkpointDir: String, n: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 4, threshold: Double = 0.5,
      starCapBucketSize: Int = Int.MaxValue,
      corpusBucketCap: Option[Int] = None, seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.dedup.Dedup
        val spark = batch.sparkSession
        checkOrWriteSeedMarker(spark, corpusDir, seed)
        val b = batch.select(col("doc_id"), col("text"), col("source")).localCheckpoint()
        // within-batch canonical keep, then the cross-store gate
        val inBatchKept = b.join(
          Dedup.minHashCuratedCorpus(b, "doc_id", "text", n, bands, rowsPerBand,
              threshold, seed = seed, starCapBucketSize = starCapBucketSize)
            .select(col("doc_id")), "doc_id")
        val store = try spark.read.parquet(corpusDir).select(col("doc_id"), col("text"))
          catch { case _: org.apache.spark.sql.AnalysisException => null }
        val kept =
          if (store == null) inBatchKept
          else inBatchKept.join(
            // the cross-store corpus bucket cap (a seeded store can be
            // raw crawl — the two-sided K_in×K_c wall, IngestBlast r14):
            // its own knob since ADVICE r14, following the star cap
            // unless tuned apart
            Dedup.minHashDedupAgainstCorpus(inBatchKept, store, "doc_id", "text",
              n, bands, rowsPerBand, threshold, seed = seed,
              corpusBucketCap = corpusBucketCap.getOrElse(starCapBucketSize)), "doc_id")
        kept.select(col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
        kept.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()

  /** Where the store's banding-seed marker lives. The leading
    * underscore keeps it invisible to `spark.read.parquet(corpusDir)`
    * (same convention as `_SUCCESS`), so the store stays readable by
    * batch consumers with the marker in place.
    */
  def seedMarkerPath(corpusDir: String): String =
    s"$corpusDir/_seed.json"

  /** The one-seed-per-store-lifetime contract, made MECHANICAL
    * (VERDICT r16 #1 — previously scaladoc prose only): the first
    * micro-batch against a store persists the banding seed as
    * `<corpusDir>/_seed.json`; every subsequent batch (including
    * after a stream restart) re-reads it and FAILS LOUDLY on a
    * mismatch. Without this, rotating the seed against a WARM store
    * silently changes which near-dups are admitted — kept/store
    * semantics drift with rc=0, the worst failure shape for the
    * engine's only long-lived mutable state.
    *
    * A store seeded by hand (`batch=seed/` placed before the first
    * stream start) holds raw text with no banding applied yet, so the
    * first stream's seed rightfully becomes the store's lifetime seed
    * — first open ADOPTS. Adoption is refused, though, for a
    * marker-less store that already has NUMBERED batch directories: a
    * warm store built by pre-marker code was accumulated under some
    * historical seed this code cannot know, and silently blessing the
    * restarting stream's seed would be exactly the drift the marker
    * exists to prevent. Upgrading such a store is one explicit
    * operator action: write `{"seed": <historical>}` to `_seed.json`.
    * Rotation therefore means: new corpusDir (cold start).
    *
    * Hadoop FileSystem, not java.nio: at scale the store lives on
    * HDFS/S3 and the marker must travel with it. The check is one
    * tiny-file read per micro-batch — noise next to the band join.
    *
    * Durability/race posture: the marker is written to a temp name
    * and renamed into place, so a driver crash mid-write cannot leave
    * a truncated `_seed.json` that wedges the store, and on
    * filesystems with atomic rename (HDFS, local) a two-writer
    * creation race resolves to one winner — the loser's rename fails,
    * it deletes its temp and re-enters the compare path, getting the
    * attributed mismatch message rather than a raw filesystem error.
    * On object stores without atomic rename (S3) the race guard is
    * best-effort only; the per-batch re-read bounds any damage to a
    * single micro-batch before the mismatch is caught.
    */
  private[streaming] def checkOrWriteSeedMarker(spark: SparkSession,
      corpusDir: String, seed: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val path = new Path(seedMarkerPath(corpusDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      val in = fs.open(path)
      val txt = try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.mkString finally src.close()
      } finally in.close()
      val stored = """"seed"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(
          s"[graft.streaming near-dup store] unparseable seed marker at " +
          s"${seedMarkerPath(corpusDir)}: '$txt'. If a crash corrupted it, " +
          s"restore it by hand with the store's known lifetime seed " +
          s"""(echo '{"seed": <lifetime seed>}') — do NOT guess: a wrong """ +
          s"value silently changes kept/store semantics."))
      if (stored != seed) throw new IllegalStateException(
        s"[graft.streaming near-dup store] banding-seed mismatch: the store at " +
        s"$corpusDir was created under MinHash banding seed $stored but this " +
        s"stream was started with seed $seed. Rotating the seed against a warm " +
        s"store silently changes kept/store semantics (one seed per store " +
        s"lifetime). Either restart with seed=$stored, or rotate from a cold " +
        s"start into a fresh corpusDir.")
    } else {
      // no marker: adopt only if this store has no numbered batch
      // output yet (fresh, or hand-seeded raw text under batch=seed/).
      // A marker-less store WITH numbered batches predates the marker
      // mechanism and its historical seed is unknowable here.
      val corpusPath = new Path(corpusDir)
      val legacyBatches =
        if (!fs.exists(corpusPath)) Array.empty[String]
        else fs.listStatus(corpusPath).map(_.getPath.getName)
          .filter(n => n.startsWith("batch=") && n != "batch=seed")
      if (legacyBatches.nonEmpty) throw new IllegalStateException(
        s"[graft.streaming near-dup store] the store at $corpusDir has " +
        s"${legacyBatches.length} numbered batch director" +
        s"${if (legacyBatches.length == 1) "y" else "ies"} but no _seed.json " +
        s"marker — it was accumulated by pre-marker code under a seed this " +
        s"stream cannot verify. Refusing to adopt seed $seed blindly: write " +
        s"""the store's historical seed to ${seedMarkerPath(corpusDir)} """ +
        s"""(format {"seed": <value>}) and restart.""")
      // temp-and-rename: never expose a partially-written marker
      val tmp = new Path(s"${seedMarkerPath(corpusDir)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"""{"seed": $seed}""".getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, path)) {
        // rename refused: either we lost a creation race (a marker
        // appeared since the exists() check — adjudicate against the
        // winner's) or the filesystem failed the rename outright. The
        // exists() distinction bounds this to ONE re-entry: recursing
        // on a persistently-failing rename would never terminate.
        fs.delete(tmp, false)
        if (fs.exists(path)) checkOrWriteSeedMarker(spark, corpusDir, seed)
        else throw new IllegalStateException(
          s"[graft.streaming near-dup store] could not persist the seed " +
          s"marker: rename of $tmp to $path failed and no marker exists — " +
          s"filesystem fault, not a seed conflict. Fix the store path and " +
          s"restart; the batch wrote nothing.")
      }
    }
  }
}
