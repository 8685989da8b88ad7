package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Deduplication queries over the documents/embeddings tables. All are
  * DuckDB-oracle-checkable: the hashing is md5-based Column arithmetic
  * reproducible in any engine, and the seeded MinHash permutation
  * family (dd04) is interpolated into generated oracle SQL. MinHash
  * recall is additionally asserted against exact Jaccard in DedupSpec.
  */
object DedupQueries {

  /** Exact dedup via normalized-text fingerprint groups. */
  private def dd01Exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val dd01Sql =
    """WITH fp AS (
      |  SELECT doc_id, md5(translate(regexp_replace(trim(text), '[ \t\n\f\r]+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp
      |  FROM documents
      |), g AS (
      |  SELECT fp, min(doc_id) AS canonical_id, count(*) AS group_size
      |  FROM fp GROUP BY fp
      |)
      |SELECT doc_id, canonical_id, group_size,
      |  CAST(doc_id != canonical_id AS INTEGER) AS is_dup
      |FROM fp JOIN g ON fp.fp IS NOT DISTINCT FROM g.fp
      |ORDER BY doc_id""".stripMargin

  /** Exact 3-gram Jaccard near-dup pairs at threshold 0.5. */
  private def dd02Jaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val dd02Sql =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(th) - 1),
      |    i -> ((th[i] * 1048583 + th[i+1]) % 2147483647 * 1048583 + th[i+2]) % 2147483647)) AS sh
      |  FROM (
      |    SELECT doc_id, list_transform(toks,
      |      t -> ('0x' || substr(md5(t), 1, 12))::BIGINT % 2147483647) AS th,
      |      toks
      |    FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |          FROM documents)
      |  )
      |  WHERE len(toks) >= 3
      |), inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |  round(common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE), 4) AS jaccard
      |FROM pairs
      |JOIN sizes na ON doc_a = na.doc_id
      |JOIN sizes nb ON doc_b = nb.doc_id
      |WHERE common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** 48-bit SimHash fingerprint per document. */
  private def dd03Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash(Tables.documents(s, dir), "doc_id", "text", bits = 48)
      .orderBy(col("doc_id"))

  private val dd03Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '')) AS t
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok
      |), b AS (
      |  SELECT doc_id, h, unnest(range(48)) AS bit FROM h
      |), v AS (
      |  SELECT doc_id, bit,
      |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM b GROUP BY doc_id, bit
      |)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
      |FROM v GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** MinHash+LSH candidate pairs (8 bands × 4 rows). The permutation
    * family is seeded, so the oracle SQL is GENERATED with the same
    * coefficients as literals (Dedup.minHashCoeffs keeps both sides in
    * sync); banding "docs sharing any band bucket" is expressed as a
    * UNION of per-band signature equi-joins — set-identical to the
    * band-key join because the "_"-concat of numeric keys is injective.
    */
  private def dd04MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashCandidatePairs(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))

  /** Distinct hashed-shingle CTE shared by dd02/dd04/dd08 oracles —
    * mirrors Dedup.hashedShingleRows (md5 token hash → positional mix,
    * n=3). Body only, so callers choose WITH vs WITH RECURSIVE.
    */
  private val shingleCteBody =
    """sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(th) - 1),
      |    i -> ((th[i] * 1048583 + th[i+1]) % 2147483647 * 1048583 + th[i+2]) % 2147483647)) AS sh
      |  FROM (
      |    SELECT doc_id, list_transform(toks,
      |      t -> ('0x' || substr(md5(t), 1, 12))::BIGINT % 2147483647) AS th,
      |      toks
      |    FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |          FROM documents)
      |  )
      |  WHERE len(toks) >= 3
      |)""".stripMargin

  private val dd04Sql: String = {
    val bands = 8; val rowsPerBand = 4
    val coeffs = Dedup.minHashCoeffs(bands * rowsPerBand)
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      s"    min((h * $a + $b) % 2147483647) AS mh_$i"
    }.mkString(",\n")
    val bandJoins = (0 until bands).map { bd =>
      val conds = (0 until rowsPerBand)
        .map(r => s"a.mh_${bd * rowsPerBand + r} = b.mh_${bd * rowsPerBand + r}")
        .mkString(" AND ")
      s"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n" +
        s"  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $conds"
    }.mkString("\n  UNION\n")
    s"""WITH $shingleCteBody, inv AS (SELECT doc_id, unnest(sh) AS h FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM inv GROUP BY doc_id
       |), pairs AS (
       |$bandJoins
       |)
       |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Embedding-cosine near-dup pairs at threshold 0.35 (exact,
    * quadratic baseline; the LSH path is sim02).
    */
  private def dd05CosinePairs(s: SparkSession, dir: String): DataFrame =
    Dedup.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.35)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))

  private val dd05Sql =
    s"""WITH e AS (SELECT vec_id, v FROM ${OracleVec.EmbFinite} t)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(${OracleVec.cosPair("a.v", "b.v")}, 4) AS cosine
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE ${OracleVec.cosPair("a.v", "b.v")} >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  /** SimHash near-dup pairs within hamming distance 3 via banded
    * indexing. The oracle uses the plain O(n²) formulation — the
    * pigeonhole banding provably returns the same set.
    */
  private def dd06SimhashPairs(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val dd06Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '')) AS t
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok
      |), b AS (
      |  SELECT doc_id, h, unnest(range(48)) AS bit FROM h
      |), v AS (
      |  SELECT doc_id, bit,
      |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM b GROUP BY doc_id, bit
      |), s AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM v GROUP BY doc_id
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Incremental dedup: docs 400+ arrive against the 0–399 corpus;
    * keep canonical fresh docs only.
    */
  private def dd07Incremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.dedupAgainstCorpus(
      docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
      "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  private val dd07Sql =
    """WITH fp AS (
      |  SELECT doc_id, md5(translate(regexp_replace(trim(text), '[ \t\n\f\r]+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp
      |  FROM documents
      |), fresh AS (
      |  SELECT i.doc_id, i.fp FROM fp i
      |  WHERE i.doc_id >= 400
      |    AND NOT EXISTS (SELECT 1 FROM fp c WHERE c.doc_id < 400 AND c.fp = i.fp)
      |)
      |SELECT min(doc_id) AS doc_id FROM fresh GROUP BY fp
      |ORDER BY doc_id""".stripMargin

  /** Duplicate clusters: connected components over the exact-Jaccard
    * near-dup pairs (dd02's edges) via iterative min-label
    * propagation. The oracle computes the same min-reachable-id
    * labels with a recursive CTE over the symmetrized edge list.
    *
    * Byte-identical docs are collapsed before the pairwise stage and
    * the membership re-expanded after (r12 duplicate-blast probe,
    * SCALE.md): the output enumerates members, so it is linear in
    * cluster size either way, but the candidate generation inside
    * jaccardPairs was O(K²) for a K-identical boilerplate cluster.
    * Equivalence: an exact group is jaccard-1-complete, so its
    * members' component label is its rep's label (or the rep itself
    * when the group is a cluster on its own), and member counts per
    * label are unchanged. Pinned against the uncollapsed formulation
    * in DedupSpec.
    */
  private def dd08Clusters(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardClustersExactFirst(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy(col("doc_id"))

  private val dd08Sql =
    s"""WITH RECURSIVE $shingleCteBody,
       | inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       | sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
       | cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       | ), pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id
       |  WHERE common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE) >= 0.5
       | ), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       | ), walk(v, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, walk.label FROM walk JOIN edges e ON walk.v = e.src
       | ), labels AS (
       |  SELECT v AS doc_id, min(label) AS cluster_id FROM walk GROUP BY v
       | )
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM labels
       |ORDER BY doc_id""".stripMargin

  /** End-to-end near-dup curation: cluster the exact-Jaccard pairs,
    * keep each cluster's canonical doc, pass untouched docs through —
    * the deduped-corpus view a training pipeline actually materializes
    * (the dedup analogue of tx07's quality curation).
    */
  private def dd09Curate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // collapse byte-identical docs first (r12 duplicate-blast probe):
    // a K-copy boilerplate cluster otherwise costs O(K²) candidates
    // inside jaccardPairs for an output this canonical-keep never
    // grows by. Semantics unchanged — see Dedup.collapseIdenticalTexts
    // and the DedupSpec equivalence battery.
    val collapsed = Dedup.collapseIdenticalTexts(docs, "doc_id", "text", minTokens = 3)
    val pairs = Dedup.jaccardPairs(collapsed, "doc_id", "text", n = 3, threshold = 0.5)
    Dedup.keepCanonical(collapsed, "doc_id",
        Dedup.duplicateClusters(pairs, "doc_a", "doc_b"))
      .select(col("doc_id"), length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val dd09Sql =
    s"""WITH RECURSIVE $shingleCteBody,
       | inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       | sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
       | cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       | ), pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id
       |  WHERE common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE) >= 0.5
       | ), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       | ), walk(v, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, walk.label FROM walk JOIN edges e ON walk.v = e.src
       | ), labels AS (
       |  SELECT v AS doc_id, min(label) AS cluster_id FROM walk GROUP BY v
       | )
       |SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
       |FROM documents d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM labels l WHERE l.doc_id = d.doc_id AND l.cluster_id != d.doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** The composed web-scale dedup pipeline: MinHash-LSH candidates →
    * exact-Jaccard verification on candidates only → components →
    * canonical keep. Same semantics as dd09 whenever LSH recall is
    * complete; the oracle re-derives the ENTIRE chain (seeded
    * signature mins, band self-joins, candidate-restricted
    * verification, recursive components) so any recall miss would
    * surface as a hash mismatch.
    */
  /** The dd14 chain, shared VERBATIM by dd14 (exact candidates) and
    * dd14b (star cap engaged) — one body so "dd14b is dd14's exact
    * chain with the cap" is structural: retuning any knob here retunes
    * both keys together, preserving the shared-oracle justification.
    */
  private def dd14Chain(s: SparkSession, dir: String, starCap: Int): DataFrame =
    // byte-identical collapse before the LSH chain (r12): identical
    // docs share every band, so a K-copy cluster floods the band
    // buckets with O(K²) candidates; collapsed, the chain sees one
    // member per text and keepCanonical keeps the same min-id set.
    Dedup.minHashCuratedCorpus(
        Dedup.collapseIdenticalTexts(Tables.documents(s, dir), "doc_id", "text",
          minTokens = 3),
        "doc_id", "text", n = 3, bands = 8, rowsPerBand = 4, threshold = 0.5,
        starCapBucketSize = starCap)
      .orderBy(col("doc_id"))

  private def dd14MinhashCurated(s: SparkSession, dir: String): DataFrame =
    dd14Chain(s, dir, Int.MaxValue)

  /** dd14's exact chain with the star cap ENGAGED (starCapBucketSize =
    * 64) — the r13 scale feature under the driver's hash gate instead
    * of spec-only coverage (VERDICT r13 #1, the one judge-authorized
    * catalog addition; everything else stays frozen at the r11 set).
    *
    * Why the oracle is dd14's SQL UNCHANGED: the cap only changes
    * candidate GENERATION for band buckets larger than 64 members. On
    * clean shards no bucket approaches that regime (the sf0.01/sf0.1
    * corpora have no 64-member near-dup cluster), so the capped arm
    * emits the identical candidate set — and even where a bucket DOES
    * overflow, DedupSpec's blast test pins kept-set equality because
    * every star edge verifies and the component stays connected through
    * the bucket minimum. A hash mismatch here would mean the capped arm
    * regressed, which is exactly what this key exists to catch every
    * round — with one adjudication caveat for the future: if a
    * regenerated testdata shard ever DID grow a >64-member band bucket
    * of mutually-dissimilar docs (the giant-MIXED class DedupSpec's
    * witness constructs), dd14b keeping MORE docs than dd14 would be
    * the cap working as designed, not a regression — re-adjudicate
    * against DedupSpec's equality and one-sided pins before touching
    * the code.
    */
  /** dd14b's star cap — shared with DedupSpec's shard-premise tripwire
    * (the Dd16bCorpusCap pattern) so a retune here cannot desync from
    * the bound the tripwire asserts on the shipped shards.
    */
  private[graft] val Dd14bStarCap = 64

  private def dd14bMinhashStar(s: SparkSession, dir: String): DataFrame =
    dd14Chain(s, dir, starCap = Dd14bStarCap)

  private val dd14Sql: String = {
    val bands = 8; val rowsPerBand = 4
    val coeffs = Dedup.minHashCoeffs(bands * rowsPerBand)
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      s"    min((h * $a + $b) % 2147483647) AS mh_$i"
    }.mkString(",\n")
    // UNION ALL + outer DISTINCT, NOT a bare UNION chain: inside a
    // WITH RECURSIVE block DuckDB does not set-dedupe a multi-branch
    // UNION in a non-recursive CTE, so a pair matching in 2+ bands
    // came back duplicated — doubling its shared-shingle count and
    // zeroing the Jaccard denominator. Surfaced by the sf0.1 sweep
    // (pair 1237/4246 matched two bands); sf0.01 had no multi-band
    // pair, which is why the driver-scale gate alone missed it.
    val bandJoins = (0 until bands).map { bd =>
      val conds = (0 until rowsPerBand)
        .map(r => s"a.mh_${bd * rowsPerBand + r} = b.mh_${bd * rowsPerBand + r}")
        .mkString(" AND ")
      s"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n" +
        s"  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $conds"
    }.mkString("\n  UNION ALL\n")
    s"""WITH RECURSIVE $shingleCteBody,
       | inv AS (SELECT doc_id, unnest(sh) AS h FROM sh),
       | sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
       | sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM inv GROUP BY doc_id
       | ), cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |$bandJoins
       |  )
       | ), common AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS common
       |  FROM cand c
       |  JOIN inv a ON a.doc_id = c.doc_a
       |  JOIN inv b ON b.doc_id = c.doc_b AND b.h = a.h
       |  GROUP BY 1, 2
       | ), pairs AS (
       |  SELECT doc_a, doc_b FROM common
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id
       |  WHERE common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE) >= 0.5
       | ), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       | ), walk(v, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, walk.label FROM walk JOIN edges e ON walk.v = e.src
       | ), labels AS (
       |  SELECT v AS doc_id, min(label) AS cluster_id FROM walk GROUP BY v
       | )
       |SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
       |FROM documents d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM labels l WHERE l.doc_id = d.doc_id AND l.cluster_id != d.doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Dedup-index evaluation harness (the q85 idea for MinHash): per
    * banding configuration, how many of the TRUE near-dup pairs (dd02's
    * exact inverted-index pairs at 0.5) the LSH candidates recover —
    * the recall measurement that justifies bands/rowsPerBand before a
    * 100 TB run. One summary row: true pairs, candidates, recovered,
    * recall.
    */
  private def dd15LshRecall(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // ONE tokenize+md5+shingle pass shared by the exact side and the
    // LSH side (r20): the unstaged form ran hashedShingleRows twice —
    // once checkpointed inside jaccardPairs, once again inside the
    // minHashCandidatePairs chain — two full corpus scans for one
    // index. Both FromShingles entries are definitionally the same
    // chains over the same frame, so the output is value-identical.
    val inv = Dedup.hashedShingleRows(docs, "doc_id", "text", 3).localCheckpoint()
    val exact = Dedup.jaccardPairsFromShingles(inv, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    // NOT materialized (r19 optimization round, measured): `cand` feeds
    // two subtrees (the recall probe join and the candidate count), but
    // ReuseExchange already dedups the identical LSH chain under both —
    // an explicit localCheckpoint measured NEUTRAL-to-worse at sf0.1
    // (3.07 s vs 3.42 s steady, console A/B), so the plan stays as-is.
    val cand = Dedup.minHashCandidatePairsFromShingles(inv)
      .select(col("doc_a").as("ca"), col("doc_b").as("cb"))
    val hit = exact.join(cand,
      col("doc_a") === col("ca") && col("doc_b") === col("cb"), "left")
    hit.agg(
        count(lit(1)).as("true_pairs"),
        count(col("ca")).as("recovered"))
      .crossJoin(cand.agg(count(lit(1)).as("candidates")))
      .select(col("true_pairs"), col("candidates"), col("recovered"),
        round(col("recovered") / col("true_pairs"), 4).as("recall"))
  }

  private val dd15Sql: String = {
    val bands = 8; val rowsPerBand = 4
    val coeffs = Dedup.minHashCoeffs(bands * rowsPerBand)
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      s"    min((h * $a + $b) % 2147483647) AS mh_$i"
    }.mkString(",\n")
    val bandJoins = (0 until bands).map { bd =>
      val conds = (0 until rowsPerBand)
        .map(r => s"a.mh_${bd * rowsPerBand + r} = b.mh_${bd * rowsPerBand + r}")
        .mkString(" AND ")
      s"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n" +
        s"  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $conds"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $shingleCteBody,
       | inv AS (SELECT doc_id, unnest(sh) AS h FROM sh),
       | sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
       | co AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       | ), exact AS (
       |  SELECT doc_a, doc_b FROM co
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id
       |  WHERE common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE) >= 0.5
       | ), sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM inv GROUP BY doc_id
       | ), cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |$bandJoins
       |  )
       | )
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM exact) AS true_pairs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS candidates,
       |  (SELECT CAST(count(*) AS BIGINT) FROM exact e
       |    JOIN cand c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b) AS recovered,
       |  round((SELECT count(*) FROM exact e
       |    JOIN cand c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b)
       |    / CAST((SELECT count(*) FROM exact) AS DOUBLE), 4) AS recall""".stripMargin
  }

  /** The dd16 chain, shared VERBATIM by dd16 (exact candidates) and
    * dd16b (corpus bucket cap engaged) — the dd14b/dd14Chain precedent
    * applied to the CROSS-STORE gate: one body so "dd16b is dd16's
    * exact chain with the cap" is structural, and retuning any knob
    * retunes both keys together, preserving the shared-oracle
    * justification.
    */
  private def dd16Chain(s: SparkSession, dir: String, corpusCap: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.minHashDedupAgainstCorpus(
        docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
        "doc_id", "text", corpusBucketCap = corpusCap)
      .orderBy(col("doc_id"))
  }

  /** Incremental MinHash dedup: docs ≥ 400 arrive against the < 400
    * corpus (dd07's split, near-dup instead of exact). Banded
    * candidates cross-side only, exact-Jaccard verification, drop on
    * any verified corpus near-dup.
    */
  private def dd16IncrementalMinhash(s: SparkSession, dir: String): DataFrame =
    dd16Chain(s, dir, Int.MaxValue)

  /** dd16's exact chain with the corpus bucket cap ENGAGED
    * (corpusBucketCap = 8) — the r14 cross-store mitigation (IngestBlast,
    * SCALE.md r14 session 3) under the driver's hash gate instead of
    * spec-only coverage (VERDICT r14 #1, the one judge-authorized
    * catalog addition for r15; everything else stays frozen).
    *
    * Why the oracle is dd16's SQL UNCHANGED: the cap only changes which
    * CORPUS members a band bucket contributes as candidates, and only
    * for buckets larger than 8. On clean shards no corpus bucket
    * approaches that regime (measured: the doc_id < 400 corpus side's
    * largest band bucket is 2 members at sf0.01 and 1 at sf0.1), so
    * the capped arm emits the identical candidate set — and even where a bucket DID overflow, a
    * genuine near-dup family's members verify near-equally, so any
    * above-threshold incoming doc still matches one of the kept 8
    * (DedupSpec's two-sided-flood pin: byte-identical kept set at
    * K=1000). A hash mismatch here means the capped arm regressed —
    * exactly what this key exists to catch every round — with the same
    * future-adjudication caveat as dd14b: if a regenerated shard ever
    * grew a giant MIXED corpus bucket, dd16b keeping MORE incoming docs
    * than dd16 would be the cap's documented one-sided recall loss
    * working as designed (never a wrong drop) — re-adjudicate against
    * DedupSpec's one-sided pins before touching the code.
    */
  /** dd16b's corpus bucket cap — shared with DedupSpec's shard-premise
    * tripwire so a retune here (FIXTURES.md §4's re-adjudication
    * branch) cannot desync from the bound the tripwire asserts.
    */
  private[graft] val Dd16bCorpusCap = 8

  private def dd16bIncrCapped(s: SparkSession, dir: String): DataFrame =
    dd16Chain(s, dir, corpusCap = Dd16bCorpusCap)

  private val dd16Sql: String = {
    val bands = 8; val rowsPerBand = 4
    val coeffs = Dedup.minHashCoeffs(bands * rowsPerBand)
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      s"    min((h * $a + $b) % 2147483647) AS mh_$i"
    }.mkString(",\n")
    val bandJoins = (0 until bands).map { bd =>
      val conds = (0 until rowsPerBand)
        .map(r => s"a.mh_${bd * rowsPerBand + r} = b.mh_${bd * rowsPerBand + r}")
        .mkString(" AND ")
      s"  SELECT a.doc_id AS doc_c, b.doc_id AS doc_in\n" +
        s"  FROM sig a JOIN sig b ON a.doc_id < 400 AND b.doc_id >= 400 AND $conds"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $shingleCteBody,
       | inv AS (SELECT doc_id, unnest(sh) AS h FROM sh),
       | sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
       | sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM inv GROUP BY doc_id
       | ), cand AS (
       |  SELECT DISTINCT doc_c, doc_in FROM (
       |$bandJoins
       |  )
       | ), common AS (
       |  SELECT c.doc_c, c.doc_in, count(*) AS common
       |  FROM cand c
       |  JOIN inv a ON a.doc_id = c.doc_c
       |  JOIN inv b ON b.doc_id = c.doc_in AND b.h = a.h
       |  GROUP BY 1, 2
       | ), dup AS (
       |  SELECT DISTINCT doc_in FROM common
       |  JOIN sizes nc ON doc_c = nc.doc_id
       |  JOIN sizes ni ON doc_in = ni.doc_id
       |  WHERE common / CAST(nc.n_sh + ni.n_sh - common AS DOUBLE) >= 0.5
       | )
       |SELECT d.doc_id FROM documents d
       |WHERE d.doc_id >= 400
       |  AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc_in = d.doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Quality-aware canonical selection: cluster the exact-Jaccard
    * near-dup pairs (dd02/dd08's edges), keep each cluster's
    * HIGHEST-quality member (tx02's score), pass singletons through.
    * dd09's min-id canonical rule upgraded to the one curation
    * pipelines really use.
    */
  private def dd13QualityCanonical(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // byte-identical collapse before pairing (r12): identical text ⇒
    // identical quality, so the quality-argmax canonical (ties to min
    // id) is preserved — an exact group's winner IS its min-id rep,
    // and a collapsed rep appearing as a singleton emits the same
    // (rep, rep, quality) row the uncollapsed best-of-cluster emits.
    val collapsed = Dedup.collapseIdenticalTexts(docs, "doc_id", "text", minTokens = 3)
    val pairs = Dedup.jaccardPairs(collapsed, "doc_id", "text", n = 3, threshold = 0.5)
    // quality over a staged token attribute (r19 optimization round,
    // TextStats FromTokens note): the text-input form re-tokenized
    // every doc 6× inside curateByQuality's quality projection
    Dedup.curateByQuality(
        collapsed.withColumn("__tk", graft.text.TextStats.tokens(col("text"))),
        pairs, "doc_id",
        graft.text.TextStats.qualityScoreFromTokens(col("__tk")))
      .orderBy(col("doc_id"))
  }

  /** Oracle: dd08's recursive-CTE components + tx02's quality formula,
    * window argmax per cluster, NOT EXISTS pass-through for
    * singletons.
    */
  private val dd13Sql =
    s"""WITH RECURSIVE $shingleCteBody,
       | inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       | sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
       | cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       | ), pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id
       |  WHERE common / CAST(na.n_sh + nb.n_sh - common AS DOUBLE) >= 0.5
       | ), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       | ), walk(v, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, walk.label FROM walk JOIN edges e ON walk.v = e.src
       | ), labels AS (
       |  SELECT v AS doc_id, min(label) AS cluster_id FROM walk GROUP BY v
       | ), q AS (
       |  -- CASE mirrors TextStats.qualityScore's token-less guard:
       |  -- a doc with no tokens scores a defined 0.0 on both engines
       |  SELECT doc_id,
       |    CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
       |      round(0.4 * least(len(toks) / 50.0, 1.0)
       |          + 0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
       |          + 0.2 * least(5.0 * (len(list_filter(toks, x -> list_contains(
       |              ['the','a','an','and','or','of','to','in','is','it'], x)))
       |            / CAST(len(toks) AS DOUBLE)), 1.0), 6)
       |    END AS quality
       |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '${graft.text.TextStats.WsClass}+'), z -> z != '') AS toks
       |        FROM documents)
       | ), best AS (
       |  SELECT doc_id, cluster_id, quality FROM (
       |    SELECT l.doc_id, l.cluster_id, q.quality,
       |      row_number() OVER (PARTITION BY l.cluster_id
       |        ORDER BY q.quality DESC, l.doc_id) AS rk
       |    FROM labels l JOIN q USING (doc_id))
       |  WHERE rk = 1
       | ), singles AS (
       |  SELECT q.doc_id, q.doc_id AS cluster_id, q.quality FROM q
       |  WHERE NOT EXISTS (SELECT 1 FROM labels l WHERE l.doc_id = q.doc_id)
       | )
       |SELECT doc_id, cluster_id, quality
       |FROM (SELECT * FROM best UNION ALL SELECT * FROM singles)
       |ORDER BY doc_id""".stripMargin

  /** Semantic dedup (SemDeDup-shaped): nearest-centroid cells over the
    * first 8 corpus vectors (deterministic quantizer both engines
    * re-derive from the table, the sim03 technique), greedy-leader
    * keep within each cell at cosine ≥ 0.35. Output is the kept set.
    */
  private def dd12SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids =
      graft.similarity.Ann.screenedSeedVectors(emb, "vec_id", "embedding", 8)
    Dedup.semanticDedup(emb, "vec_id", "embedding", centroids, threshold = 0.35)
      .orderBy(col("id"))
  }

  /** Oracle: same comparator chain as the sim03 oracle (assignment by
    * |c|² − 2·v·c with cell-index tie-break), then the greedy-leader
    * NOT EXISTS. list_cosine_similarity's double arithmetic matches
    * the VectorExprs kernel bit-for-bit (dd05-proven parity).
    */
  private val dd12Sql =
    s"""WITH e AS (SELECT vec_id, v FROM ${OracleVec.EmbScreened} t),
      |-- cell ids are POSITIONAL over the screened seed set (the
      |-- engine zipWithIndex's its collected centroids), not raw
      |-- vec_ids: identical on clean data, but a screened-out seed
      |-- (the planted NaN at vec_id 5) shifts every later id
      |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
      |           AS cell0, v AS cv
      |         FROM e WHERE vec_id < 8),
      |assign AS (
      |  SELECT e.vec_id, e.v, c.cell0,
      |    list_dot_product(c.cv, c.cv) - 2.0::DOUBLE * list_dot_product(e.v, c.cv) AS dist,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(c.cv, c.cv) - 2.0::DOUBLE * list_dot_product(e.v, c.cv),
      |      c.cell0) AS rn
      |  FROM e, cent c),
      |ranked AS (
      |  SELECT vec_id, v, cell0 AS cell,
      |    CAST(row_number() OVER (PARTITION BY cell0 ORDER BY dist, vec_id) AS INTEGER)
      |      AS cell_rank
      |  FROM assign WHERE rn = 1),
      |dropped AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM ranked a JOIN ranked b
      |    ON a.cell = b.cell AND a.cell_rank < b.cell_rank
      |  WHERE ${OracleVec.cos("a.v", "b.v")} >= 0.35)
      |SELECT r.vec_id AS id, CAST(r.cell AS INTEGER) AS cell, r.cell_rank
      |FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.vec_id
      |WHERE d.vec_id IS NULL
      |ORDER BY id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dd01_exact_dedup", dd01Exact, Some(dd01Sql)),
    Q("dd02_jaccard_pairs", dd02Jaccard, Some(dd02Sql)),
    Q("dd03_simhash", dd03Simhash, Some(dd03Sql)),
    Q("dd04_minhash_lsh", dd04MinhashLsh, Some(dd04Sql)),
    Q("dd05_cosine_pairs", dd05CosinePairs, Some(dd05Sql)),
    Q("dd06_simhash_pairs", dd06SimhashPairs, Some(dd06Sql)),
    Q("dd07_incremental", dd07Incremental, Some(dd07Sql)),
    Q("dd08_dup_clusters", dd08Clusters, Some(dd08Sql)),
    Q("dd09_curated_corpus", dd09Curate, Some(dd09Sql)),
    Q("dd12_semantic_dedup", dd12SemanticDedup, Some(dd12Sql)),
    Q("dd13_quality_canonical", dd13QualityCanonical, Some(dd13Sql)),
    Q("dd14_minhash_curated", dd14MinhashCurated, Some(dd14Sql)),
    Q("dd14b_minhash_star", dd14bMinhashStar, Some(dd14Sql)),
    Q("dd15_lsh_recall", dd15LshRecall, Some(dd15Sql)),
    Q("dd16_incr_minhash", dd16IncrementalMinhash, Some(dd16Sql)),
    Q("dd16b_incr_capped", dd16bIncrCapped, Some(dd16Sql)),
  )
}
