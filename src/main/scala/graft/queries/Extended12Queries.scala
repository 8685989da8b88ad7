package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextStats

/** Round-7 eighth wave: prefix-filtered set-similarity join — the
  * PPJoin/AllPairs candidate-reduction principle (Chaudhuri et al.
  * SSJoin, Xiao et al. PPJoin): a pair with token-set Jaccard ≥ t must
  * share at least one token among each side's (|s| − ⌈t·|s|⌉ + 1)
  * RAREST tokens, so the inverted index is built over those short
  * prefixes only — candidate volume collapses versus indexing every
  * token (dd02's full inverted index), and the exact verification runs
  * on candidates alone.
  */
object Extended12Queries {

  /** Shingle-Jaccard ≥ 0.5 doc pairs via prefix filtering. Set
    * elements are 48-bit-hashed 3-gram shingles (unigram token sets
    * are useless here — the corpus's shared function-word vocabulary
    * puts ~92k doc pairs above 0.5 token-set Jaccard, vs 25 real
    * near-dup pairs by shingles). Global shingle frequency (the prefix
    * ordering) is a domain-bounded aggregate; the per-doc rank window
    * partitions by doc; the index join touches only prefix shingles —
    * and the rarest-first order makes those buckets the SMALLEST ones,
    * which is the entire PPJoin bet. Exact verification runs on
    * candidates only.
    */
  private def dd18PrefixFilter(s: SparkSession, dir: String): DataFrame = {
    val t = 0.5
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 2)")).as("i"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Hash48(
        expr("concat_ws(' ', slice(toks, i, 3))")).as("tok"))
      .distinct()
    // df, |s|, and the rarity rank all ride as WINDOWS over the one
    // postings frame instead of separate groupBy aggregates re-joined
    // back (r7 verdict item 3: this plan is DAG-depth-bound, not
    // data-bound). The df window exchanges by tok — the same hash the
    // candidate self-join needs anyway; the sz and pos windows share
    // one exchange by doc_id. No broadcast anywhere: shingle frequency
    // scales with corpus vocabulary at 100 TB.
    val base = toks
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      // every consumer (prefix postings ×2, sizes, verify tail ×2)
      // reads this one materialization — the q103 chained-stage lesson
      .localCheckpoint()
    // prefix length: |s| − ⌈t·|s|⌉ + 1 rarest tokens; keep pos and sz
    // so the candidate join can apply PPJoin's other two filters
    val ranked = base
      .filter(col("pos") <= col("sz") - ceil(col("sz") * t) + 1)
      .select(col("doc_id"), col("tok"), col("pos"), col("sz"))
    // Candidate join = prefix match + LENGTH filter (J ≥ t forces
    // min(|a|,|b|) ≥ t·max(|a|,|b|)) + POSITIONAL filter (a match at
    // prefix positions (pa, pb) bounds the overlap by 1 + min(|a|−pa,
    // |b|−pb); a true pair's FIRST common prefix token always passes,
    // so no true pair is lost — Xiao et al.'s ppjoin pruning). These
    // cut the profiled candidate volume ~400k → the filtered few
    // thousand that verification then touches, which is what makes the
    // verify tail cheap at any scale.
    val alpha = ceil((col("a.sz") + col("b.sz")) * lit(t) / lit(1 + t))
    val cands = ranked.as("a").join(ranked.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.sz"), col("b.sz")) >=
          lit(t) * greatest(col("a.sz"), col("b.sz")) &&
        lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))
          >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      // consumed three times (pair probe, candDocs, inter) — tiny
      .localCheckpoint()
    // exact verification on candidates only, and IN-ROW: fold each
    // candidate document's shingle set into one array (bounded by doc
    // length, so rows stay small), equi-join the pair list to the two
    // arrays, and compute |a∩b| per pair. This replaces the old
    // pairs×shingles expansion (profiled 6.5M-row two-join verify,
    // ~2 s steady) with two joins of |cands| rows and a per-row set
    // intersection — the verify cost now scales with the CANDIDATE
    // count, not candidates × doc length.
    //
    // r19 optimization round, two changes to the verify tail (guide
    // §1.2 per-task work + §2.4 duplicated subtrees), measured from the
    // 124,961-candidate reality at sf0.1 (the prefix buckets of this
    // templated corpus are far fatter than real-crawl rarest-shingle
    // buckets, so the verify pass dominates the query):
    //  1. the doc-set arrays are sorted ONCE per doc at build
    //     (sort_array, 4.8k docs) and |a∩b| runs as the codegen'd
    //     sorted-merge SortedIntersectCount — value-identical to
    //     size(array_intersect) on these distinct sorted arrays, but
    //     O(n+m) with no per-pair hash-set allocation. array_intersect
    //     built an OpenHashSet per evaluation, and the jaccard filter's
    //     pushdown into the join condition made that 2-3 evaluations
    //     per candidate: measured 1.3 s of pure CPU in the verify task.
    //  2. docSets is materialized once (localCheckpoint): it fed both
    //     join sides as two separate subtrees, so the collect_list
    //     aggregation (a full pass over the shingle index at any scale)
    //     ran twice.
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b"))).distinct()
    val docSets = base.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("tok"))).as("ts"), first(col("sz")).as("sz"))
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    cands
      .join(docSets.select(col("doc_id").as("doc_a"),
        col("ts").as("ts_a"), col("sz").as("sz_a")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"),
        col("ts").as("ts_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("inter",
        graft.functions.ArrayFns.sortedIntersectCount(col("ts_a"), col("ts_b")))
      .withColumn("jaccard", round(col("inter") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val dd18Sql =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS ts
      |  FROM documents),
      |toks AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 12))::BIGINT AS tok
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
      |        FROM t0 WHERE len(ts) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
      |freq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
      |ranked AS (
      |  SELECT t.doc_id, t.tok
      |  FROM (
      |    SELECT t0.doc_id, t0.tok, z.sz,
      |      row_number() OVER (PARTITION BY t0.doc_id ORDER BY f.df, t0.tok) AS pos
      |    FROM toks t0 JOIN freq f USING (tok) JOIN sizes z USING (doc_id)) t
      |  WHERE t.pos <= t.sz - ceil(t.sz * 0.5) + 1),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ranked a JOIN ranked b
      |    ON a.tok = b.tok AND a.doc_id < b.doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS inter
      |  FROM cands c
      |    JOIN toks ta ON ta.doc_id = c.doc_a
      |    JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
      |  GROUP BY 1, 2)
      |SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS inter,
      |  round(i.inter / CAST(za.sz + zb.sz - i.inter AS DOUBLE), 4) AS jaccard
      |FROM inter i
      |  JOIN sizes za ON za.doc_id = i.doc_a
      |  JOIN sizes zb ON zb.doc_id = i.doc_b
      |WHERE round(i.inter / CAST(za.sz + zb.sz - i.inter AS DOUBLE), 4) >= 0.5
      |ORDER BY i.doc_a, i.doc_b""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dd18_prefix_filter", dd18PrefixFilter, Some(dd18Sql)),
  )
}
