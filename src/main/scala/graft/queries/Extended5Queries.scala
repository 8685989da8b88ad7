package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.CountMin
import graft.text.{SpanDedup, TextStats}

/** Round-6 widening, part 2: corpus-curation depth. Span-level
  * cross-document dedup (CCNet line dedup adapted to the corpus's
  * newline-free text), sliding-window duplicated-passage profiling
  * (the shuffle-engine approximation of suffix-array substring dedup),
  * a count-min sketch with cross-engine-deterministic md5 hashing, and
  * int8-quantized ANN whose integer dots make the ranking exactly
  * reproducible. All four DuckDB-oracle-checked.
  */
object Extended5Queries {

  /** CCNet-style duplicated-span removal over 8-token spans: spans
    * appearing in >1 document are boilerplate and dropped everywhere;
    * cleaned text is fingerprinted so the oracle verifies CONTENT and
    * ORDER of the reassembly, not just counts.
    */
  private def tx12SpanDedup(s: SparkSession, dir: String): DataFrame =
    SpanDedup.dedupSpans(Tables.documents(s, dir), window = 8)
      .orderBy(col("doc_id"))

  private val tx12Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents),
      |spans AS (
      |  SELECT doc_id, CAST((st - 1) // 8 AS INTEGER) AS span_idx,
      |    array_to_string(toks[st:st+7], ' ') AS span_text
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 8)) AS st
      |        FROM toks WHERE len(toks) > 0)),
      |withfp AS (SELECT doc_id, span_idx, span_text,
      |    ('0x' || substr(md5(span_text), 1, 12))::BIGINT AS span_fp FROM spans),
      |dup AS (SELECT span_fp FROM withfp GROUP BY span_fp HAVING count(DISTINCT doc_id) > 1),
      |kept AS (SELECT * FROM withfp WHERE span_fp NOT IN (SELECT span_fp FROM dup)),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
      |    md5(string_agg(span_text, ' ' ORDER BY span_idx)) AS cleaned_fp
      |  FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_spans FROM withfp GROUP BY doc_id)
      |SELECT t.doc_id, t.n_spans, coalesce(a.n_kept, 0) AS n_kept,
      |  coalesce(a.cleaned_fp, md5('')) AS cleaned_fp
      |FROM tot t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  /** Winnowed duplicated-passage profile (MOSS fingerprints, k=8-gram
    * hashes winnowed over w=8 windows): alignment-free detection of
    * any ≥ 15-token passage shared between documents. Per-doc shared
    * fraction is the curation threshold score.
    */
  private def dd10PassageOverlap(s: SparkSession, dir: String): DataFrame =
    SpanDedup.passageOverlap(Tables.documents(s, dir), k = 8, w = 8)
      .orderBy(col("doc_id"))

  private val dd10Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, st AS pos,
      |    ('0x' || substr(md5(array_to_string(toks[st:st+7], ' ')), 1, 12))::BIGINT AS gfp
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS st
      |        FROM toks WHERE len(toks) >= 8)),
      |sel AS (
      |  SELECT DISTINCT doc_id, win_fp FROM (
      |    SELECT doc_id,
      |      count(*) OVER fr AS n_in,
      |      min(gfp) OVER fr AS win_fp
      |    FROM grams
      |    WINDOW fr AS (PARTITION BY doc_id ORDER BY pos
      |                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING))
      |  WHERE n_in = 8),
      |shared AS (SELECT win_fp FROM sel GROUP BY win_fp HAVING count(DISTINCT doc_id) > 1),
      |flagged AS (
      |  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_shared
      |  FROM sel WHERE win_fp IN (SELECT win_fp FROM shared) GROUP BY doc_id),
      |tot AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_fps FROM sel GROUP BY doc_id)
      |SELECT t.doc_id, t.n_fps, coalesce(f.n_shared, 0) AS n_shared,
      |  round(coalesce(f.n_shared, 0) / CAST(t.n_fps AS DOUBLE), 4) AS shared_frac
      |FROM tot t LEFT JOIN flagged f USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  /** Count-min sketch (d=4, w=64) over the token stream, estimates
    * joined against exact counts for every distinct token. The oracle
    * rebuilds the identical sketch (md5 buckets), so cms_est matches
    * cell-for-cell; SketchSpec pins est ≥ exact (the CMS guarantee).
    */
  private def q79CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.documents(s, dir)
      .select(explode(TextStats.tokens(col("text"))).as("item"))
    val cells = CountMin.counters(items, d = 4, w = 64)
    val exact = items.groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
    CountMin.estimate(exact.select(col("item")), cells, d = 4, w = 64)
      .join(exact, Seq("item"))
      .select(col("item"), col("exact_cnt"), col("cms_est"))
      .orderBy(col("item"))
  }

  private val q79Sql =
    """WITH items AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '')) AS item
      |  FROM documents),
      |seeds AS (SELECT unnest(range(0, 4)) AS seed),
      |exact AS (SELECT item, count(*) AS exact_cnt FROM items GROUP BY item),
      |cells AS (
      |  SELECT seed,
      |    ('0x' || substr(md5(seed || ':' || item), 1, 12))::BIGINT % 64 AS bucket,
      |    count(*) AS cnt
      |  FROM items CROSS JOIN seeds
      |  GROUP BY 1, 2),
      |probes AS (
      |  SELECT e.item, s.seed,
      |    ('0x' || substr(md5(s.seed || ':' || e.item), 1, 12))::BIGINT % 64 AS bucket
      |  FROM exact e CROSS JOIN seeds s),
      |est AS (
      |  SELECT p.item, min(c.cnt) AS cms_est
      |  FROM probes p JOIN cells c ON c.seed = p.seed AND c.bucket = p.bucket
      |  GROUP BY p.item)
      |SELECT e.item, e.exact_cnt, est.cms_est
      |FROM exact e JOIN est USING (item)
      |ORDER BY item""".stripMargin

  /** Int8-quantized top-5 for the first 10 vectors: global symmetric
    * scale, explicit half-up rounding, integer dot ranking (ties by
    * neighbor_id) — exactly reproducible cross-engine, unlike float
    * cosine near a top-k cut.
    */
  private def sim04QuantizedTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.similarity.Ann.quantizedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  private val sim04Sql =
    s"""WITH e AS (SELECT vec_id, embedding FROM ${OracleVec.EmbScreened} t),
      |s AS (
      |  SELECT 127.0 / CAST(max(list_max(list_transform(embedding, x -> abs(x)))) AS DOUBLE) AS scale
      |  FROM e),
      |qz AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * scale + 0.5)) AS qv
      |  FROM e, s),
      |pairs AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS qdot
      |  FROM qz q JOIN qz c ON q.vec_id != c.vec_id
      |  WHERE q.vec_id < 10),
      |ranked AS (
      |  SELECT query_id, neighbor_id, qdot,
      |    CAST(row_number() OVER (
      |      PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM pairs)
      |SELECT query_id, rank, neighbor_id, qdot
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Group-wise z-score outliers on customer balances: |z| ≥ 1.6 sample
    * standard deviations from the nation mean. The z is rounded on
    * BOTH sides before the compare (ops.Stats contract) so float
    * aggregation order can't flip boundary rows.
    */
  private def q80GroupOutliers(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.zscoreOutliers(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
        groupCol = "c_nationkey", valueCol = "c_acctbal", zMin = 1.6)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("z"))
      .orderBy(col("c_custkey"))

  private val q80Sql =
    """WITH s AS (
      |  SELECT c_nationkey, avg(c_acctbal) AS mu, stddev_samp(c_acctbal) AS sd
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_custkey, c_nationkey, c_acctbal, round((c_acctbal - mu) / sd, 4) AS z
      |FROM customer JOIN s USING (c_nationkey)
      |WHERE abs(round((c_acctbal - mu) / sd, 4)) >= 1.6
      |ORDER BY c_custkey""".stripMargin

  /** Sorted-neighborhood record-linkage candidates over part names:
    * block on the first name word, sort by (name, key), pair rows
    * within 2 neighborhood positions, keep Levenshtein ≤ 2.
    */
  private def q81SortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.sortedNeighborhoodPairs(
        Tables.part(s, dir), idCol = "p_partkey", nameCol = "p_name",
        blockExpr = expr("split_part(p_name, ' ', 1)"), window = 2, maxDist = 2)
      .orderBy(col("id_a"), col("id_b"))

  private val q81Sql =
    """WITH b AS (
      |  SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk,
      |    row_number() OVER (PARTITION BY split_part(p_name, ' ', 1)
      |                       ORDER BY p_name, p_partkey) AS rn
      |  FROM part)
      |SELECT a.p_partkey AS id_a, c.p_partkey AS id_b,
      |  a.p_name AS name_a, c.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, c.p_name) AS INTEGER) AS dist
      |FROM b a JOIN b c ON a.blk = c.blk AND c.rn - a.rn BETWEEN 1 AND 2
      |WHERE levenshtein(a.p_name, c.p_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  /** Deterministic fixed-size stratified sample: the 3 smallest-md5
    * orders per priority class — exact per-group size, reproducible on
    * any engine/partitioning (vs sampleBy's expected-rate semantics).
    */
  private def q82GroupSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.groupSample(
        Tables.orders(s, dir).select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        groupCol = "o_orderpriority", keyCol = "o_orderkey", n = 3)
      .select(col("o_orderpriority"), col("sample_rank"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("sample_rank"))

  private val q82Sql =
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS INTEGER) AS sample_rank
      |  FROM orders)
      |SELECT o_orderpriority, sample_rank, o_orderkey, o_totalprice
      |FROM r WHERE sample_rank <= 3
      |ORDER BY o_orderpriority, sample_rank""".stripMargin

  /** Passage-level duplicate clusters: documents sharing any winnowed
    * fingerprint become edges; connected components label the cluster.
    * The end-to-end composition (winnow → fingerprint join → min-label
    * propagation) a substring-dedup pipeline actually materializes —
    * each stage individually gated by dd10/dd08.
    */
  private def dd11PassageClusters(s: SparkSession, dir: String): DataFrame = {
    val sel = SpanDedup.winnowedFingerprints(Tables.documents(s, dir), k = 8, w = 8)
    val pairs = sel.as("a").join(sel.as("b"),
        col("a.win_fp") === col("b.win_fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    graft.dedup.Dedup.duplicateClusters(pairs, "doc_a", "doc_b")
      .orderBy(col("doc_id"))
  }

  private val dd11Sql =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, st AS pos,
      |    ('0x' || substr(md5(array_to_string(toks[st:st+7], ' ')), 1, 12))::BIGINT AS gfp
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS st
      |        FROM toks WHERE len(toks) >= 8)),
      |sel AS (
      |  SELECT DISTINCT doc_id, win_fp FROM (
      |    SELECT doc_id,
      |      count(*) OVER fr AS n_in,
      |      min(gfp) OVER fr AS win_fp
      |    FROM grams
      |    WINDOW fr AS (PARTITION BY doc_id ORDER BY pos
      |                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING))
      |  WHERE n_in = 8),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sel a JOIN sel b ON a.win_fp = b.win_fp AND a.doc_id < b.doc_id),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |walk(v, label) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, walk.label FROM walk JOIN edges e ON walk.v = e.src),
      |labels AS (
      |  SELECT v AS doc_id, min(label) AS cluster_id FROM walk GROUP BY v)
      |SELECT doc_id, cluster_id,
      |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |FROM labels
      |ORDER BY doc_id""".stripMargin

  /** Distributed BPE training, 8 merges over the corpus vocabulary.
    * The oracle is fully self-derived (no interpolated values): 8
    * unrolled CTE rounds each recomputing pair counts, taking the
    * same (count DESC, lhs, rhs) argmax, and applying the same
    * boundary-guarded replace.
    */
  private def tx13BpeTrain(s: SparkSession, dir: String): DataFrame =
    graft.text.BpeTrainer.train(Tables.documents(s, dir), "text", numMerges = 8)
      .orderBy(col("merge_rank"))

  /** Tokenizer APPLICATION at corpus scale: learn the same 8 merges
    * tx13 gates, then tokenize every document with them — per doc, the
    * count of trainable tokens and their total BPE piece count (the
    * token-budget estimate a training pipeline prices datasets with).
    * The piece table is per distinct WORD (vocab ≪ corpus) and
    * broadcasts back onto the token stream; merges replay as 8 literal
    * codegen'd replaces.
    */
  private def tx15BpeApply(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = graft.text.BpeTrainer.train(docs, "text", numMerges = 8)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = docs.select(col("doc_id"),
      explode(TextStats.tokens(col("text"))).as("word"))
    val pieces = graft.text.BpeTrainer
      .applyMerges(toks.select(col("word")).distinct(), "word", merges)
      .select(col("word"), size(col("pieces")).as("n_pieces"))
    toks.join(broadcast(pieces), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("n_pieces")).as("n_trainable"),
        coalesce(sum(col("n_pieces")), lit(0L)).as("n_pieces"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated bigram NLL (λ=0.7) over the documents corpus — the
    * next-order perplexity filter above tx11's unigram model. The lag
    * window, LM joins, and per-doc aggregate all reproduce exactly in
    * ANSI SQL.
    */
  private def tx14BigramNll(s: SparkSession, dir: String): DataFrame =
    TextStats.bigramNll(Tables.documents(s, dir), "doc_id", "text", lambda = 0.7)
      .orderBy(col("doc_id"))

  private val tx14Sql =
    """WITH base AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS t
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, pos, t[pos] AS w
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos FROM base)),
      |seq AS (
      |  SELECT doc_id, pos, w, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM toks),
      |uni AS (SELECT w, count(*) AS cu FROM toks GROUP BY 1),
      |total AS (SELECT count(*) AS total FROM toks),
      |big AS (SELECT prev, w, count(*) AS cb FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      |ctx AS (SELECT prev, count(*) AS cctx FROM seq WHERE prev IS NOT NULL GROUP BY 1)
      |SELECT s.doc_id, count(*) AS n_tokens,
      |  round(avg(-ln(CASE WHEN s.prev IS NULL THEN u.cu / CAST(t.total AS DOUBLE)
      |    ELSE 0.7 * b.cb / CAST(c.cctx AS DOUBLE)
      |       + 0.3 * u.cu / CAST(t.total AS DOUBLE) END)), 4) AS bigram_nll
      |FROM seq s JOIN uni u ON s.w = u.w CROSS JOIN total t
      |LEFT JOIN big b ON s.prev = b.prev AND s.w = b.w
      |LEFT JOIN ctx c ON s.prev = c.prev
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Span novelty over 8-token spans: the id-ordered contribution
    * score — what fraction of each doc's spans first appear there.
    */
  private def tx16SpanNovelty(s: SparkSession, dir: String): DataFrame =
    SpanDedup.spanNovelty(Tables.documents(s, dir), window = 8)
      .orderBy(col("doc_id"))

  private val tx16Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents),
      |spans AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(array_to_string(toks[st:st+7], ' ')), 1, 12))::BIGINT AS span_fp
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 8)) AS st
      |        FROM toks WHERE len(toks) > 0)),
      |firsts AS (SELECT span_fp, min(doc_id) AS first_doc FROM spans GROUP BY 1)
      |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE), 4) AS novelty
      |FROM spans s JOIN firsts f USING (span_fp)
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Quality percentile per doc WITHOUT a global sort: CDF via the
    * count-histogram of rounded scores (distinct values ≪ docs), a
    * running sum over that tiny table, and a join back on the score —
    * the scalable alternative to percent_rank's full-corpus window.
    * pct_le = fraction of docs with quality ≤ yours.
    */
  private def tx17QualityPercentile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    // unscored docs (NULL text → NULL quality) leave the percentile
    // POPULATION, not just the output: before this filter the NULL
    // group rode the cumulative at the Spark end (nulls-first) and the
    // DuckDB end (nulls-last) of the histogram, shifting every real
    // bucket's pct_le by 1/total on exactly one engine (r12 chaos
    // parity). No-op when every doc scores.
    // staged tokenization (r19 optimization round, TextStats FromTokens
    // note) — and materialized ONCE: `q` feeds three subtrees (the
    // histogram, the total, and the final join), so the unstaged form
    // tokenized and quality-scored the corpus three times over.
    val q = docs
      .withColumn("__tk", TextStats.tokens(col("text")))
      .select(col("doc_id"),
        round(TextStats.qualityScoreFromTokens(col("__tk")), 4).as("quality"))
      .filter(col("quality").isNotNull)
      .localCheckpoint()
    val hist = q.groupBy(col("quality")).agg(count(lit(1)).as("nq"))
    val cum = hist.withColumn("cum", sum(col("nq")).over(
      Window.orderBy(col("quality")).rowsBetween(Window.unboundedPreceding, 0)))
    val total = q.agg(count(lit(1)).as("total"))
    q.join(broadcast(cum.select(col("quality"), col("cum"))), "quality")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("quality"),
        round(col("cum") / col("total"), 4).as("pct_le"))
      .orderBy(col("doc_id"))
  }

  private val tx17Sql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents),
      |q AS (
      |  -- CASE mirrors TextStats.qualityScore's token-less guard:
      |  -- a doc with no tokens scores a defined 0.0 on both engines
      |  SELECT doc_id,
      |    CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
      |      round(0.4 * least(len(toks) / 50.0, 1.0)
      |          + 0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
      |          + 0.2 * least(5.0 * (len(list_filter(toks, x -> list_contains(
      |              ['the','a','an','and','or','of','to','in','is','it'], x)))
      |            / CAST(len(toks) AS DOUBLE)), 1.0), 4)
      |    END AS quality
      |  FROM t),
      |qs AS (SELECT * FROM q WHERE quality IS NOT NULL),
      |hist AS (SELECT quality, count(*) AS nq FROM qs GROUP BY 1),
      |cum AS (
      |  SELECT quality, sum(nq) OVER (ORDER BY quality
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |total AS (SELECT count(*) AS total FROM qs)
      |SELECT qs.doc_id, qs.quality, round(c.cum / CAST(t.total AS DOUBLE), 4) AS pct_le
      |FROM qs JOIN cum c USING (quality) CROSS JOIN total t
      |ORDER BY qs.doc_id""".stripMargin

  /** Curation-funnel observability: how many docs survive each gate
    * of the mx05 pipeline (eligibility → exact-dedup canonical →
    * quality → repetition → decontamination), computed in ONE pass:
    * every gate becomes a boolean flag on a single frame, and the six
    * cumulative-conjunction counts come from one aggregate — the
    * pipeline telemetry a curation run reports without re-running a
    * filter chain per stage.
    */
  private def mx06CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Dedup
    val docs = Tables.documents(s, dir)
    val canon = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("is_dup") === 0).select(col("doc_id"), lit(true).as("canon"))
    val toks = docs.select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0).localCheckpoint()
    // quality from the ALREADY-materialized token frame (r19
    // optimization round): the text-input form re-tokenized the corpus
    // a second time (6× inside qualityScore), and the `toks` filter
    // (size > 0) is exactly the tokenCount(text) > 0 gate
    val quality = toks
      .select(col("doc_id"),
        (TextStats.qualityScoreFromTokens(col("toks")) >= 0.5).as("q_ok"))
    val rep = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 1)")).as("i"))
      .select(col("doc_id"), expr("concat_ws(' ', slice(toks, i, 2))").as("bg"))
      .groupBy(col("doc_id"))
      .agg(((lit(1) - countDistinct(col("bg")) / count(lit(1))) <= 0.4).as("rep_ok"))
    // 48-bit hashed shingles: the distinct shuffles 8-byte longs and
    // the broadcast benchmark set is ~5× smaller than with raw strings.
    val sh = toks.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 4)")).as("i"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Hash48(
        expr("concat_ws(' ', slice(toks, i, 5))")).as("s5"))
      .distinct()
    val contaminated = sh.filter(col("doc_id") >= 25)
      .join(broadcast(sh.filter(col("doc_id") < 25).select(col("s5")).distinct()), "s5")
      .select(col("doc_id")).distinct().withColumn("contam", lit(true))
    val flags = docs.select(col("doc_id"), (col("doc_id") >= 25).as("eligible"))
      .join(canon, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("eligible"),
        coalesce(col("canon"), lit(false)).as("canon"),
        coalesce(col("q_ok"), lit(false)).as("q_ok"),
        coalesce(col("rep_ok"), lit(false)).as("rep_ok"),
        coalesce(col("contam"), lit(false)).as("contam"))
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    flags.agg(
        count(lit(1)).as("s1"),
        cnt(col("eligible")).as("s2"),
        cnt(col("eligible") && col("canon")).as("s3"),
        cnt(col("eligible") && col("canon") && col("q_ok")).as("s4"),
        cnt(col("eligible") && col("canon") && col("q_ok") && col("rep_ok")).as("s5"),
        cnt(col("eligible") && col("canon") && col("q_ok") && col("rep_ok")
          && !col("contam")).as("s6"))
      .select(explode(map(
        lit(1), col("s1"), lit(2), col("s2"), lit(3), col("s3"),
        lit(4), col("s4"), lit(5), col("s5"), lit(6), col("s6")))
        .as(Seq("stage_idx", "n_docs")))
      .withColumn("stage", element_at(array(
        lit("all"), lit("eligible"), lit("canonical"), lit("quality"),
        lit("repetition"), lit("decontaminated")), col("stage_idx")))
      .select(col("stage_idx"), col("stage"), col("n_docs"))
      .orderBy(col("stage_idx"))
  }

  private val mx06Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents),
      |fp AS (
      |  SELECT doc_id, md5(translate(regexp_replace(trim(text), '[ \t\n\f\r]+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS c FROM fp)
      |  WHERE doc_id = c),
      |m AS (
      |  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
      |    len(list_filter(toks, x -> list_contains(
      |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS nstop
      |  FROM toks WHERE len(toks) > 0),
      |q AS (
      |  SELECT doc_id,
      |    0.4 * least(n / 50.0, 1.0) + 0.4 * (nd / CAST(n AS DOUBLE))
      |      + 0.2 * least(5.0 * (nstop / CAST(n AS DOUBLE)), 1.0) AS quality
      |  FROM m),
      |bg AS (
      |  SELECT doc_id, count(*) AS nb, count(DISTINCT b) AS nd
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))) AS b
      |        FROM toks WHERE len(toks) >= 2)
      |  GROUP BY doc_id),
      |rep AS (SELECT doc_id, 1 - nd / CAST(nb AS DOUBLE) AS dup_frac FROM bg),
      |sh AS (
      |  SELECT DISTINCT doc_id, ('0x' || substr(md5(s5s), 1, 12))::BIGINT AS s5
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))) AS s5s
      |        FROM toks WHERE len(toks) >= 5)),
      |contaminated AS (
      |  SELECT DISTINCT c.doc_id
      |  FROM sh c JOIN (SELECT DISTINCT s5 FROM sh WHERE doc_id < 25) b USING (s5)
      |  WHERE c.doc_id >= 25),
      |flags AS (
      |  SELECT d.doc_id,
      |    d.doc_id >= 25 AS eligible,
      |    (c.doc_id IS NOT NULL) AS canon,
      |    coalesce(q.quality >= 0.5, false) AS q_ok,
      |    coalesce(rep.dup_frac <= 0.4, false) AS rep_ok,
      |    (ct.doc_id IS NOT NULL) AS contam
      |  FROM documents d
      |  LEFT JOIN canon c USING (doc_id)
      |  LEFT JOIN q USING (doc_id)
      |  LEFT JOIN rep USING (doc_id)
      |  LEFT JOIN contaminated ct USING (doc_id))
      |SELECT stage_idx, stage, n_docs FROM (
      |  SELECT 1 AS stage_idx, 'all' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM flags
      |  UNION ALL SELECT 2, 'eligible',
      |    CAST(sum(CASE WHEN eligible THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      |  UNION ALL SELECT 3, 'canonical',
      |    CAST(sum(CASE WHEN eligible AND canon THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      |  UNION ALL SELECT 4, 'quality',
      |    CAST(sum(CASE WHEN eligible AND canon AND q_ok THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      |  UNION ALL SELECT 5, 'repetition',
      |    CAST(sum(CASE WHEN eligible AND canon AND q_ok AND rep_ok THEN 1 ELSE 0 END) AS BIGINT)
      |    FROM flags
      |  UNION ALL SELECT 6, 'decontaminated',
      |    CAST(sum(CASE WHEN eligible AND canon AND q_ok AND rep_ok AND NOT contam
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM flags)
      |ORDER BY stage_idx""".stripMargin

  /** Per-user event-type transition matrix (first-order Markov
    * estimate) — the sequence statistic behavioral-dataset pipelines
    * compute before sessionizing or sampling. Successors come from a
    * lag window per user ordered by (epoch-micros, event_id) — the
    * deterministic tie order both engines share; probabilities are
    * per-source-state row counts over the tiny transition table.
    */
  private def q86TransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val trans = e.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val margins = trans.groupBy(col("prev")).agg(sum(col("n")).as("n_from"))
    trans.join(margins, "prev")
      .select(col("prev"), col("next"), col("n"),
        round(col("n") / col("n_from"), 4).as("p"))
      .orderBy(col("prev"), col("next"))
  }

  private val q86Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
      |seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY us NULLS FIRST, event_id) AS prev
      |  FROM e),
      |trans AS (
      |  SELECT prev, event_type AS next, count(*) AS n
      |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      |margins AS (SELECT prev, sum(n) AS n_from FROM trans GROUP BY 1)
      |SELECT t.prev, t.next, CAST(t.n AS BIGINT) AS n,
      |  round(t.n / CAST(m.n_from AS DOUBLE), 4) AS p
      |FROM trans t JOIN margins m USING (prev)
      |ORDER BY t.prev, t.next""".stripMargin

  /** Cross-source contamination matrix: for every source pair, how
    * many distinct 5-gram shingles they share and what fraction of
    * the smaller side's shingle vocabulary that is — the
    * leakage-between-subcorpora diagnostic run before treating
    * sources as independent mixture components (tx08 checks docs
    * against one benchmark; this checks every source against every
    * other).
    */
  private def tx18SourceContamination(s: SparkSession, dir: String): DataFrame = {
    // Shingles are reduced to 48-bit md5-derived longs BEFORE the
    // distinct and the self-join: the inverted-index shuffle carries
    // 8-byte keys instead of ~40-byte 5-gram strings (the Dedup
    // hashedShingleRows discipline — never shuffle shingle text).
    val inv = Tables.documents(s, dir)
      .select(col("source"), TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("source"), col("toks"),
        explode(expr("sequence(1, size(toks) - 4)")).as("i"))
      .select(col("source"), graft.dedup.Dedup.md5Hash48(
        expr("concat_ws(' ', slice(toks, i, 5))")).as("s5"))
      .distinct()
      // materialized (r19 optimization round): ReuseExchange dedups the
      // self-join's two identical sides but NOT the sizes agg (different
      // grouping), which re-ran the whole tokenize+shingle pass —
      // console A/B 1.48-1.60 s → 1.19-1.43 s steady at sf0.1
      .localCheckpoint()
    val sizes = inv.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    inv.toDF("source_a", "s5")
      .join(inv.toDF("source_b", "s5"), Seq("s5"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b")).agg(count(lit(1)).as("shared"))
      .join(sizes.toDF("source_a", "n_a"), "source_a")
      .join(sizes.toDF("source_b", "n_b"), "source_b")
      .select(col("source_a"), col("source_b"), col("shared"),
        round(col("shared") / least(col("n_a"), col("n_b")), 4).as("overlap"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private val tx18Sql =
    """WITH inv AS (
      |  SELECT DISTINCT source, ('0x' || substr(md5(s5s), 1, 12))::BIGINT AS s5
      |  FROM (
      |    SELECT source,
      |      unnest(list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))) AS s5s
      |    FROM (SELECT source, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |          FROM documents)
      |    WHERE len(toks) >= 5)),
      |sizes AS (SELECT source, count(*) AS n_sh FROM inv GROUP BY 1),
      |shared AS (
      |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
      |  FROM inv a JOIN inv b ON a.s5 = b.s5 AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s.source_a, s.source_b, CAST(s.shared AS BIGINT) AS shared,
      |  round(s.shared / CAST(least(na.n_sh, nb.n_sh) AS DOUBLE), 4) AS overlap
      |FROM shared s
      |JOIN sizes na ON s.source_a = na.source
      |JOIN sizes nb ON s.source_b = nb.source
      |ORDER BY s.source_a, s.source_b""".stripMargin

  /** Temperature-scaled mixture weights (the multilingual-sampling
    * formula: p_s ∝ n_s^α with α = 0.5): per source, its document
    * count, natural share, and the α-scaled sampling weight that
    * up-samples small sources. Two tiny aggregates over one per-source
    * count — the mixing table mx02 consumes, now derived in-engine
    * instead of supplied.
    */
  private def mx07TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum(col("n_docs")).as("total"),
      sum(pow(col("n_docs"), 0.5)).as("pow_total"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"),
        round(col("n_docs") / col("total"), 4).as("natural_share"),
        round(pow(col("n_docs"), 0.5) / col("pow_total"), 4).as("alpha_weight"))
      .orderBy(col("source"))
  }

  private val mx07Sql =
    """WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |totals AS (
      |  SELECT sum(n_docs) AS total, sum(pow(n_docs, 0.5)) AS pow_total FROM counts)
      |SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
      |  round(c.n_docs / CAST(t.total AS DOUBLE), 4) AS natural_share,
      |  round(pow(c.n_docs, 0.5) / t.pow_total, 4) AS alpha_weight
      |FROM counts c CROSS JOIN totals t
      |ORDER BY c.source""".stripMargin

  /** Key-skew profile of events.user_id — the pre-join diagnostic for
    * salting/broadcast/AQE decisions, emitted as (metric, value) rows.
    */
  private def q83KeySkew(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.keySkewProfile(Tables.events(s, dir), "user_id")
      .orderBy(col("metric"))

  private val q83Sql =
    """WITH counts AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      |base AS (
      |  SELECT count(*) AS n_keys, sum(c) AS total_rows, max(c) AS max_cnt,
      |    avg(c) AS avg_cnt
      |  FROM counts),
      |top10 AS (
      |  SELECT sum(c) AS top10
      |  FROM (SELECT c FROM counts ORDER BY c DESC, user_id LIMIT 10)),
      |hist AS (SELECT c, count(*) AS nk FROM counts GROUP BY 1),
      |cum AS (
      |  SELECT c, sum(nk) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |p99 AS (
      |  SELECT min(c) AS p99_cnt FROM cum CROSS JOIN base
      |  WHERE cum >= ceil(n_keys * 0.99))
      |SELECT metric, value FROM (
      |  SELECT 'n_keys' AS metric, CAST(n_keys AS DOUBLE) AS value FROM base
      |  UNION ALL SELECT 'total_rows', CAST(total_rows AS DOUBLE) FROM base
      |  UNION ALL SELECT 'max_cnt', CAST(max_cnt AS DOUBLE) FROM base
      |  UNION ALL SELECT 'avg_cnt', round(avg_cnt, 4) FROM base
      |  UNION ALL SELECT 'skew_ratio', round(max_cnt / avg_cnt, 4) FROM base
      |  UNION ALL SELECT 'top10_share', round(top10 / CAST(total_rows AS DOUBLE), 4)
      |    FROM top10 CROSS JOIN base
      |  UNION ALL SELECT 'p99_cnt', CAST(p99_cnt AS DOUBLE) FROM p99)
      |ORDER BY metric""".stripMargin

  val all: Seq[Q] = Seq(
    Q("tx12_span_dedup", tx12SpanDedup, Some(tx12Sql)),
    Q("dd10_passage_overlap", dd10PassageOverlap, Some(dd10Sql)),
    Q("q79_cms_heavy_hitters", q79CmsHeavyHitters, Some(q79Sql)),
    Q("sim04_quantized_topk", sim04QuantizedTopK, Some(sim04Sql)),
    Q("q80_group_outliers", q80GroupOutliers, Some(q80Sql)),
    Q("q81_sorted_neighborhood", q81SortedNeighborhood, Some(q81Sql)),
    Q("q82_group_sample", q82GroupSample, Some(q82Sql)),
    Q("dd11_passage_clusters", dd11PassageClusters, Some(dd11Sql)),
    Q("tx13_bpe_train", tx13BpeTrain, Some(graft.text.BpeTrainer.oracleSql(8))),
    Q("tx14_bigram_nll", tx14BigramNll, Some(tx14Sql)),
    Q("tx15_bpe_apply", tx15BpeApply, Some(graft.text.BpeTrainer.applyOracleSql(8))),
    Q("tx16_span_novelty", tx16SpanNovelty, Some(tx16Sql)),
    Q("tx17_quality_percentile", tx17QualityPercentile, Some(tx17Sql)),
    Q("mx06_curation_funnel", mx06CurationFunnel, Some(mx06Sql)),
    Q("q83_key_skew", q83KeySkew, Some(q83Sql)),
    Q("q86_transition_matrix", q86TransitionMatrix, Some(q86Sql)),
    Q("tx18_source_contamination", tx18SourceContamination, Some(tx18Sql)),
    Q("mx07_temperature_mix", mx07TemperatureMix, Some(mx07Sql)))
}
