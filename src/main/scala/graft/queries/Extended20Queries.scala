package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextStats

/** Round-8 wave: the two production-delivery gates that close the
  * curation family — the end-to-end mega-pipeline (mx09) and the
  * deterministic output-sharding manifest (mx10).
  *
  * mx09 composes every curation stage this library verifies standalone
  * (dd01 exact-dedup, tx02 quality, tx10 repetition, tx08
  * decontamination, mx02 mixing, mx01 packing) into ONE Spark plan and
  * reports the per-source funnel through all eight stages — the single
  * hash-green gate that proves the operators COMPOSE into the full
  * pretraining-data pipeline, with mx06-style telemetry reconciling
  * every stage.
  *
  * mx10 is the write-side determinism contract: curated docs assigned
  * to token-budgeted output shards by a pure function of content, with
  * a manifest (docs, tokens, commutative content fingerprint) per
  * shard — identical across engines, runs, and input partitionings.
  */
object Extended20Queries {

  // ---------------------------------------------------------------
  // mx09: end-to-end pretraining-data pipeline, one plan, per-source
  // funnel. Stages: 1 all → 2 eligible (doc_id ≥ 25, the synthetic
  // benchmark split used by tx08/mx05) → 3 canonical (exact-dedup
  // keep-min-id) → 4 quality (score ≥ 0.5) → 5 repetition (dup bigram
  // frac ≤ 0.4) → 6 decontaminated (no 5-gram shared with the
  // benchmark docs) → 7 mixed (per-source hash-downsample to the
  // smallest CURATED source, mx02's md5-bucket rule re-derived on the
  // curated corpus) → 8 packed (512-token sequence packing per source;
  // n_docs reports the PACK count). n_tokens tracks the surviving
  // token mass per stage. Shuffles: doc_id (dedup fp, per-doc aggs),
  // source (funnel agg, packing window); the benchmark shingle set,
  // mixing-rate table and budget scalars are broadcast. At 100 TB the
  // shape is unchanged — every stage is the same scale-safe
  // formulation its standalone gate uses.
  // ---------------------------------------------------------------
  /** The shared pipeline frames: the per-doc gate flags and the
    * curated+mixed corpus. mx09 reports the funnel over them; mx09b
    * hash-verifies the final pack assignment doc-by-doc. */
  private def pipelineFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import graft.dedup.Dedup
    val docs = Tables.documents(s, dir)
    val canon = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("is_dup") === 0).select(col("doc_id"), lit(true).as("canon"))
    // tokenization feeds repetition + both shingle sides — once
    val toks = docs.select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0).localCheckpoint()
    // quality from the materialized token frame (r19 optimization
    // round): size(toks) > 0 IS the tokenCount gate, and the
    // text-input qualityScore re-tokenized the corpus 6× per row
    val quality = toks
      .select(col("doc_id"),
        (TextStats.qualityScoreFromTokens(col("toks")) >= 0.5).as("q_ok"))
    val rep = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 1)")).as("i"))
      .select(col("doc_id"), expr("concat_ws(' ', slice(toks, i, 2))").as("bg"))
      .groupBy(col("doc_id"))
      .agg(((lit(1) - countDistinct(col("bg")) / count(lit(1))) <= 0.4).as("rep_ok"))
    val sh = toks.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 4)")).as("i"))
      .select(col("doc_id"), Dedup.md5Hash48(
        expr("concat_ws(' ', slice(toks, i, 5))")).as("s5"))
      .distinct()
    val contaminated = sh.filter(col("doc_id") >= 25)
      .join(broadcast(sh.filter(col("doc_id") < 25).select(col("s5")).distinct()), "s5")
      .select(col("doc_id")).distinct().withColumn("contam", lit(true))
    // one flags frame; three consumers (funnel agg, mixing, packing).
    // token count over a staged token attribute (r20 FromTokens
    // consistency pass — single expansion today, safe against a second
    // consumer tomorrow)
    val flags = docs
      .withColumn("__tk", TextStats.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        size(col("__tk")).cast("long").as("n_tokens"),
        (col("doc_id") >= 25).as("eligible"))
      .join(canon, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("eligible"),
        coalesce(col("canon"), lit(false)).as("canon"),
        coalesce(col("q_ok"), lit(false)).as("q_ok"),
        coalesce(col("rep_ok"), lit(false)).as("rep_ok"),
        coalesce(col("contam"), lit(false)).as("contam"))
      .localCheckpoint()
    val curated = flags
      .filter(col("eligible") && col("canon") && col("q_ok") && col("rep_ok")
        && !col("contam"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
    // mx02's mixing rule, re-derived on the curated per-source counts:
    // keep md5-bucket < round(10000 · min_n / n_s)
    val counts = curated.groupBy(col("source")).agg(count(lit(1)).as("n_c"))
    val minN = counts.agg(min(col("n_c")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("th", round(lit(10000) * col("min_n") / col("n_c")).cast("long"))
      .select(col("source"), col("th"))
    val mixed = curated
      .withColumn("bucket",
        pmod(Dedup.md5Hash48(col("doc_id").cast("string")), lit(10000)))
      .join(broadcast(rates), "source")
      .filter(col("bucket") < col("th"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
    (flags, mixed)
  }

  private def mx09MegaPipeline(s: SparkSession, dir: String): DataFrame = {
    val (flags, mixed) = pipelineFrames(s, dir)
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def tok(c: Column) = sum(when(c, col("n_tokens")).otherwise(0L))
    val g2 = col("eligible")
    val g3 = g2 && col("canon")
    val g4 = g3 && col("q_ok")
    val g5 = g4 && col("rep_ok")
    val g6 = g5 && !col("contam")
    val funnel16 = flags.groupBy(col("source")).agg(
        count(lit(1)).as("d1"), sum(col("n_tokens")).as("t1"),
        cnt(g2).as("d2"), tok(g2).as("t2"),
        cnt(g3).as("d3"), tok(g3).as("t3"),
        cnt(g4).as("d4"), tok(g4).as("t4"),
        cnt(g5).as("d5"), tok(g5).as("t5"),
        cnt(g6).as("d6"), tok(g6).as("t6"))
      .select(col("source"), expr(
        "stack(6, 1,d1,t1, 2,d2,t2, 3,d3,t3, 4,d4,t4, 5,d5,t5, 6,d6,t6)" +
          " AS (stage_idx, n_docs, n_tokens)"))
    val s7 = mixed.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(lit(7).as("stage_idx"), col("n_docs"), col("n_tokens"), col("source"))
    // mx01's packing per source over the mixed corpus; n_docs = packs
    val wp = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s8 = mixed.withColumn("cum", sum(col("n_tokens")).over(wp))
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / lit(512)))
      .groupBy(col("source")).agg(
        countDistinct(col("pack_id")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(lit(8).as("stage_idx"), col("n_docs"), col("n_tokens"), col("source"))
    funnel16.select(col("stage_idx"), col("n_docs"), col("n_tokens"), col("source"))
      .union(s7).union(s8)
      .withColumn("stage", element_at(array(
        lit("all"), lit("eligible"), lit("canonical"), lit("quality"),
        lit("repetition"), lit("decontaminated"), lit("mixed"), lit("packed")),
        col("stage_idx")))
      .select(col("stage_idx"), col("stage"), col("source"),
        col("n_docs"), col("n_tokens"))
      .orderBy(col("stage_idx"), col("source"))
  }

  /** Shared oracle CTE chain for mx09/mx09b: document gates → curated
    * corpus → mixed corpus → pack assignment. Unreferenced CTEs in a
    * given final query are not evaluated by DuckDB. */
  private val pipelineSqlCtes =
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
      |  SELECT doc_id, count(*) AS nb, count(DISTINCT b) AS ndb
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))) AS b
      |        FROM toks WHERE len(toks) >= 2)
      |  GROUP BY doc_id),
      |rep AS (SELECT doc_id, 1 - ndb / CAST(nb AS DOUBLE) AS dup_frac FROM bg),
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
      |  SELECT d.doc_id, d.source, CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |    d.doc_id >= 25 AS eligible,
      |    (c.doc_id IS NOT NULL) AS canon,
      |    coalesce(q.quality >= 0.5, false) AS q_ok,
      |    coalesce(rep.dup_frac <= 0.4, false) AS rep_ok,
      |    (ct.doc_id IS NOT NULL) AS contam
      |  FROM documents d
      |  JOIN toks t USING (doc_id)
      |  LEFT JOIN canon c USING (doc_id)
      |  LEFT JOIN q USING (doc_id)
      |  LEFT JOIN rep USING (doc_id)
      |  LEFT JOIN contaminated ct USING (doc_id)),
      |f16 AS (
      |  SELECT source,
      |    count(*) AS d1, sum(n_tokens) AS t1,
      |    sum(CASE WHEN eligible THEN 1 ELSE 0 END) AS d2,
      |    sum(CASE WHEN eligible THEN n_tokens ELSE 0 END) AS t2,
      |    sum(CASE WHEN eligible AND canon THEN 1 ELSE 0 END) AS d3,
      |    sum(CASE WHEN eligible AND canon THEN n_tokens ELSE 0 END) AS t3,
      |    sum(CASE WHEN eligible AND canon AND q_ok THEN 1 ELSE 0 END) AS d4,
      |    sum(CASE WHEN eligible AND canon AND q_ok THEN n_tokens ELSE 0 END) AS t4,
      |    sum(CASE WHEN eligible AND canon AND q_ok AND rep_ok THEN 1 ELSE 0 END) AS d5,
      |    sum(CASE WHEN eligible AND canon AND q_ok AND rep_ok THEN n_tokens ELSE 0 END) AS t5,
      |    sum(CASE WHEN eligible AND canon AND q_ok AND rep_ok AND NOT contam THEN 1 ELSE 0 END) AS d6,
      |    sum(CASE WHEN eligible AND canon AND q_ok AND rep_ok AND NOT contam THEN n_tokens ELSE 0 END) AS t6
      |  FROM flags GROUP BY source),
      |curated AS (
      |  SELECT doc_id, source, n_tokens FROM flags
      |  WHERE eligible AND canon AND q_ok AND rep_ok AND NOT contam),
      |ccounts AS (SELECT source, count(*) AS n_c FROM curated GROUP BY 1),
      |rates AS (
      |  SELECT source,
      |    CAST(round(10000 * (SELECT min(n_c) FROM ccounts) / n_c) AS BIGINT) AS th
      |  FROM ccounts),
      |mixed AS (
      |  SELECT c.source, c.doc_id, c.n_tokens
      |  FROM curated c JOIN rates USING (source)
      |  WHERE ('0x' || substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 12))::BIGINT % 10000 < th),
      |packs AS (
      |  SELECT source, doc_id, n_tokens,
      |    floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 512.0) AS pack_id
      |  FROM mixed)""".stripMargin

  private val mx09Sql =
    s"""$pipelineSqlCtes,
      |funnel AS (
      |  SELECT 1 AS stage_idx, source, d1 AS n_docs, t1 AS n_tokens FROM f16
      |  UNION ALL SELECT 2, source, d2, t2 FROM f16
      |  UNION ALL SELECT 3, source, d3, t3 FROM f16
      |  UNION ALL SELECT 4, source, d4, t4 FROM f16
      |  UNION ALL SELECT 5, source, d5, t5 FROM f16
      |  UNION ALL SELECT 6, source, d6, t6 FROM f16
      |  UNION ALL SELECT 7, source, count(*), sum(n_tokens) FROM mixed GROUP BY source
      |  UNION ALL SELECT 8, source, count(DISTINCT pack_id), sum(n_tokens) FROM packs GROUP BY source)
      |SELECT CAST(stage_idx AS INTEGER) AS stage_idx,
      |  ['all', 'eligible', 'canonical', 'quality', 'repetition',
      |   'decontaminated', 'mixed', 'packed'][stage_idx] AS stage,
      |  source, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens
      |FROM funnel
      |ORDER BY stage_idx, source""".stripMargin

  /** mx09's funnel verifies the pipeline in AGGREGATE; this gate
    * hash-verifies the final artifact doc-by-doc — every (source,
    * doc_id, tokens, pack) row of the curated+mixed+packed corpus.
    * Together they pin both the telemetry and the delivered data. */
  private def mx09bPackDetail(s: SparkSession, dir: String): DataFrame = {
    val (_, mixed) = pipelineFrames(s, dir)
    val wp = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(wp) - col("n_tokens")) / lit(512)))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("pack_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  private val mx09bSql =
    s"""$pipelineSqlCtes
       |SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(pack_id AS BIGINT) AS pack_id
       |FROM packs
       |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // mx10: deterministic output sharding. Quality-gated docs are laid
  // out in a content-hash order (md5-bucket b = h % 1024, then h, then
  // doc_id — hash-randomized, so shard composition is independent of
  // arrival order) and cut into token-budgeted shards: budget B =
  // ceil(total/8), shard_id = start_offset DIV B (a doc straddling a
  // boundary belongs to the shard its first token lands in, so every
  // shard holds < B + max_doc_tokens). The global offset is computed
  // scale-safely: per-bucket window cumsums (partitioned, parallel)
  // plus a bucket-offset table from the BOUNDED 1024-row bucket
  // histogram — the mx08 histogram-CDF technique applied to layout.
  // The manifest fingerprints each shard with a commutative sum of
  // per-doc 48-bit hashes: any membership change flips it, and it is
  // invariant to row order and input partitioning (spec-pinned).
  // ---------------------------------------------------------------
  def shardManifest(docs: DataFrame): DataFrame = {
    import graft.dedup.Dedup
    val d = docs
      .withColumn("__tk", TextStats.tokens(col("text"))) // staged once (r19)
      .select(col("doc_id"),
        TextStats.qualityScoreFromTokens(col("__tk")).as("quality"),
        size(col("__tk")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0 && col("quality") >= 0.5)
      .select(col("doc_id"), col("n_tokens"),
        Dedup.md5Hash48(col("doc_id").cast("string")).as("h"))
      .withColumn("b", pmod(col("h"), lit(1024L)))
      // materialized (r19 optimization round): `d` feeds the budget
      // agg, the bucket histogram, AND the final probe — three
      // separate subtrees, each re-running the tokenize+quality pass
      // over the corpus (and mx11 instantiates this chain twice)
      .localCheckpoint()
    val budget = d.agg(expr("CAST((sum(n_tokens) + 7) DIV 8 AS BIGINT)").as("budget"))
    // bounded 1024-row histogram → per-bucket start offsets; the
    // no-partition window runs over the histogram, never the data
    val hist = d.groupBy(col("b")).agg(sum(col("n_tokens")).as("bt"))
    val wb = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = hist.withColumn("off", sum(col("bt")).over(wb) - col("bt"))
      .select(col("b"), col("off"))
    val ww = Window.partitionBy(col("b")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offs), "b")
      .withColumn("start_off",
        col("off") + sum(col("n_tokens")).over(ww) - col("n_tokens"))
      .crossJoin(broadcast(budget))
      .withColumn("shard_id", expr("start_off DIV budget"))
      .withColumn("fp", Dedup.md5Hash48(
        concat(col("doc_id").cast("string"), lit(":"), col("n_tokens").cast("string"))))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("fp")).as("content_fp"))
      .orderBy(col("shard_id"))
  }

  private def mx10ShardManifest(s: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(s, dir))

  /** The mx10 CTE chain with suffixed names and a doc predicate, so
    * mx11 can instantiate it once per delivery epoch. */
  private def shardChainSql(sfx: String, pred: String): String =
    s"""t$sfx AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '${TextStats.WsClass}+'), z -> z != '') AS toks
       |  FROM documents WHERE $pred),
       |m$sfx AS (
       |  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
       |    len(list_filter(toks, x -> list_contains(
       |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS nstop
       |  FROM t$sfx WHERE len(toks) > 0),
       |d$sfx AS (
       |  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |  FROM m$sfx
       |  WHERE 0.4 * least(n / 50.0, 1.0) + 0.4 * (nd / CAST(n AS DOUBLE))
       |      + 0.2 * least(5.0 * (nstop / CAST(n AS DOUBLE)), 1.0) >= 0.5),
       |tot$sfx AS (SELECT (sum(n_tokens) + 7) // 8 AS budget FROM d$sfx),
       |pos$sfx AS (
       |  SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY h % 1024, h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
       |  FROM d$sfx),
       |sh$sfx AS (
       |  SELECT start_off // budget AS shard_id, doc_id, n_tokens,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR)), 1, 12))::BIGINT AS fp
       |  FROM pos$sfx CROSS JOIN tot$sfx),
       |man$sfx AS (
       |  SELECT CAST(shard_id AS BIGINT) AS shard_id, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens, CAST(sum(fp) AS BIGINT) AS content_fp
       |  FROM sh$sfx GROUP BY shard_id)""".stripMargin

  private val mx10Sql =
    s"""WITH ${shardChainSql("", "TRUE")}
       |SELECT shard_id, n_docs, n_tokens, content_fp FROM man
       |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------
  // mx11: incremental delivery. A new batch NEVER relays out shipped
  // data: epoch-0 shards are laid out from the base corpus (doc_id <
  // 400, mx10's exact rule) and stay byte-identical forever; the
  // epoch-1 batch is laid out independently by the same rule and its
  // shard ids continue from the epoch-0 maximum. The append is pure —
  // a function of (batch content, prior max id) only — so re-running
  // a delivery is idempotent and the combined manifest is still
  // deterministic. Spec pins epoch-0 immutability against standalone
  // mx10 output on the same subset.
  // ---------------------------------------------------------------
  private def mx11IncrementalShards(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // tiny (one row per shard) but referenced twice — the offset agg
    // and the epoch-0 union arm each re-ran the whole manifest chain
    val base = shardManifest(docs.filter(col("doc_id") < 400)).localCheckpoint()
    val off = base.agg((max(col("shard_id")) + 1).as("off"))
    val batch = shardManifest(docs.filter(col("doc_id") >= 400))
      .crossJoin(broadcast(off))
      .select((col("shard_id") + col("off")).as("shard_id"),
        col("n_docs"), col("n_tokens"), col("content_fp"))
    base.select(lit(0).as("epoch"), col("shard_id"), col("n_docs"),
        col("n_tokens"), col("content_fp"))
      .union(batch.select(lit(1).as("epoch"), col("shard_id"), col("n_docs"),
        col("n_tokens"), col("content_fp")))
      .orderBy(col("epoch"), col("shard_id"))
  }

  private val mx11Sql =
    s"""WITH ${shardChainSql("_a", "doc_id < 400")},
       |${shardChainSql("_b", "doc_id >= 400")}
       |SELECT epoch, shard_id, n_docs, n_tokens, content_fp FROM (
       |  SELECT 0 AS epoch, shard_id, n_docs, n_tokens, content_fp FROM man_a
       |  UNION ALL
       |  SELECT 1, shard_id + (SELECT max(shard_id) + 1 FROM man_a),
       |    n_docs, n_tokens, content_fp
       |  FROM man_b)
       |ORDER BY epoch, shard_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("mx09_megapipeline", mx09MegaPipeline, Some(mx09Sql)),
    Q("mx09b_pack_detail", mx09bPackDetail, Some(mx09bSql)),
    Q("mx10_shard_manifest", mx10ShardManifest, Some(mx10Sql)),
    Q("mx11_incremental_shards", mx11IncrementalShards, Some(mx11Sql)))
}
