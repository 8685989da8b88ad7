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
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as("t3"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Hash48(col("t3")).as("tok"))
      .distinct().localCheckpoint()
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wd = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("tok"))
    // NO broadcast hint on freq: the shingle-frequency table scales
    // with corpus vocabulary — at 100 TB it shuffle-joins on tok
    // (both sides already hash by tok for the index join anyway)
    val ranked = toks.join(freq, "tok")
      .withColumn("pos", row_number().over(wd))
      .join(sizes, "doc_id")
      // prefix length: |s| − ⌈t·|s|⌉ + 1 rarest tokens
      .filter(col("pos") <= col("sz") - ceil(col("sz") * t) + 1)
      .select(col("doc_id"), col("tok"))
    val cands = ranked.as("a").join(ranked.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification on candidates only — and only on candidate
    // DOCUMENTS' shingles: the semi-join cuts the two intersection
    // joins from the full shingle table to the (few) docs that appear
    // in any candidate pair
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b"))).distinct()
    val candToks = toks.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val inter = cands
      .join(candToks.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(candToks.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard", round(col("inter") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val dd18Sql =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), z -> z != '') AS ts
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
