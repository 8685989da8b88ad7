package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextStats._

/** Text-analysis queries over the documents table, each a single
  * shuffle-free projection (plus one grouped agg for tx04) so the plan
  * is a parquet scan → codegen'd map at any scale.
  */
object TextQueries {

  /** Token / character statistics per document. Tokenized ONCE via a
    * staged attribute (r19 optimization round — see TextStats'
    * FromTokens note): the text-input forms re-ran the interpreted
    * split/filter once per stat.
    */
  private def tx01TokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("__tk", tokens(col("text")))
      .select(col("doc_id"),
        size(col("__tk")).as("n_tokens"),
        size(array_distinct(col("__tk"))).as("n_distinct_tokens"),
        length(col("text")).as("len_chars"),
        round(meanTokenLengthFromTokens(col("__tk")), 4).as("mean_token_len"))
      .orderBy(col("doc_id"))

  private val tx01Sql =
    """SELECT doc_id,
      |  CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '')) AS INTEGER) AS n_tokens,
      |  CAST(len(list_distinct(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != ''))) AS INTEGER) AS n_distinct_tokens,
      |  CAST(length(text) AS INTEGER) AS len_chars,
      |  round(list_sum(list_transform(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != ''), t -> length(t)))
      |        / len(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '')), 4) AS mean_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Quality scoring: diversity, stopword ratio, punctuation ratio,
    * composite score.
    */
  private def tx02Quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("__tk", tokens(col("text"))) // one split for 3 of 4 stats
      .select(col("doc_id"),
        round(typeTokenRatioFromTokens(col("__tk")), 4).as("ttr"),
        round(stopwordRatioFromTokens(col("__tk")), 4).as("stop_ratio"),
        round(punctRatio(col("text")), 4).as("punct_ratio"),
        round(qualityScoreFromTokens(col("__tk")), 4).as("quality"))
      .orderBy(col("doc_id"))

  // DuckDB mirror of TextStats.qualityScore: 0.4*min(n/50,1) +
  // 0.4*ttr + 0.2*min(5*stop_ratio,1). Degenerate-doc contract: the
  // ratios are NULL for token-less text (DuckDB's 0/0 is NULL, and the
  // Spark side divides by nullif(n, 0)); quality alone is a defined
  // 0.0 there, mirroring TextStats.qualityScore's curation-gate guard.
  private val tx02Sql =
    """WITH t AS (
      |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, text,
      |    len(toks) AS n,
      |    len(list_distinct(toks)) AS nd,
      |    len(list_filter(toks, x -> list_contains(
      |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS nstop
      |  FROM t
      |)
      |SELECT doc_id,
      |  round(nd / CAST(n AS DOUBLE), 4) AS ttr,
      |  round(nstop / CAST(n AS DOUBLE), 4) AS stop_ratio,
      |  round(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
      |  CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE) ELSE
      |    round(0.4 * least(n / 50.0, 1.0)
      |        + 0.4 * (nd / CAST(n AS DOUBLE))
      |        + 0.2 * least(5.0 * (nstop / CAST(n AS DOUBLE)), 1.0), 4)
      |  END AS quality
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic: argmax marker-word hit count, first-listed
    * language wins ties, 'und' when no marker hits.
    */
  private def tx03LangId(s: SparkSession, dir: String): DataFrame =
    withLangId(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("lang"), col("lang_pred"))
      .orderBy(col("doc_id"))

  private val tx03Sql =
    """WITH t AS (
      |  SELECT doc_id, lang, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents
      |), sc AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(toks, x -> list_contains(['the','a','is','and','of'], x))) AS c_en,
      |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS c_de,
      |    len(list_filter(toks, x -> list_contains(['el','la','los','y','es'], x))) AS c_es,
      |    len(list_filter(toks, x -> list_contains(['le','la','et','les','est'], x))) AS c_fr
      |  FROM t
      |)
      |SELECT doc_id, lang,
      |  CASE WHEN c_en = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'en'
      |       WHEN c_de = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'de'
      |       WHEN c_es = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'es'
      |       WHEN c_fr = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'fr'
      |       ELSE 'und' END AS lang_pred
      |FROM sc
      |ORDER BY doc_id""".stripMargin

  /** Corpus token frequency: explode tokens, count, top-50 — the
    * vocabulary profile a data pipeline builds before filtering.
    */
  private def tx04TokenFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(50)

  private val tx04Sql =
    """SELECT token, count(*) AS freq FROM (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '')) AS token
      |  FROM documents
      |)
      |GROUP BY token
      |ORDER BY freq DESC, token
      |LIMIT 50""".stripMargin

  /** Content fingerprint (md5 of normalized text) — the exact-dedup key. */
  private def tx05Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val tx05Sql =
    """SELECT doc_id,
      |  md5(translate(regexp_replace(trim(text), '[ \t\n\f\r]+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** BPE-ish piece counts (whitespace-independent token-budget
    * estimate): alphabetic runs / digit runs / single marks.
    */
  private def tx06BpePieces(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        bpePieceCount(col("text")).as("n_pieces"),
        // asciiLower, not lower(): full-unicode lowercasing diverges
        // between engines (İ, final sigma) — see TextStats.asciiLower
        size(array_distinct(bpePieces(asciiLower(col("text"))))).as("n_distinct_pieces"))
      .orderBy(col("doc_id"))

  private val tx06Sql =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]')) AS INTEGER) AS n_pieces,
      |  CAST(len(list_distinct(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]'))) AS INTEGER) AS n_distinct_pieces
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** End-to-end training-data curation: keep documents that (a) are the
    * canonical copy of their exact-dup group, (b) classify as English
    * by the marker heuristic, (c) score ≥ 0.6 composite quality. The
    * flagship composition of the text/dedup operators — three narrow
    * projections + one fingerprint shuffle at any scale.
    */
  private def tx07Curate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val dups = graft.dedup.Dedup.exactGroups(docs, "doc_id", "text")
      .select(col("doc_id"), col("is_dup"))
    // one tokenization pass feeds BOTH the language-ID scores and the
    // quality score (r19 optimization round — the FromTokens staging)
    withLangId(docs.withColumn("__tk", tokens(col("text"))), "text",
        tokensCol = Some("__tk"))
      .select(col("doc_id"), col("lang_pred"),
        round(qualityScoreFromTokens(col("__tk")), 4).as("quality"))
      .join(dups, "doc_id")
      .filter(col("is_dup") === 0 && col("lang_pred") === "en" && col("quality") >= 0.6)
      .select(col("doc_id"), col("quality"))
      .orderBy(col("doc_id"))
  }

  private val tx07Sql =
    """WITH t AS (
      |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS toks
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, text,
      |    len(toks) AS n, len(list_distinct(toks)) AS nd,
      |    len(list_filter(toks, x -> list_contains(
      |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS nstop,
      |    len(list_filter(toks, x -> list_contains(['the','a','is','and','of'], x))) AS c_en,
      |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS c_de,
      |    len(list_filter(toks, x -> list_contains(['el','la','los','y','es'], x))) AS c_es,
      |    len(list_filter(toks, x -> list_contains(['le','la','et','les','est'], x))) AS c_fr
      |  FROM t
      |), scored AS (
      |  SELECT doc_id,
      |    round(0.4 * least(n / 50.0, 1.0) + 0.4 * (nd / CAST(n AS DOUBLE))
      |        + 0.2 * least(5.0 * (nstop / CAST(n AS DOUBLE)), 1.0), 4) AS quality,
      |    CASE WHEN c_en = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'en'
      |         WHEN c_de = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'de'
      |         WHEN c_es = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'es'
      |         WHEN c_fr = greatest(c_en, c_de, c_es, c_fr) AND greatest(c_en, c_de, c_es, c_fr) > 0 THEN 'fr'
      |         ELSE 'und' END AS lang_pred
      |  FROM m
      |), fp AS (
      |  SELECT doc_id, md5(translate(regexp_replace(trim(text), '[ \t\n\f\r]+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp
      |  FROM documents
      |), dup AS (
      |  SELECT doc_id, CAST(doc_id != min(doc_id) OVER (PARTITION BY fp) AS INTEGER) AS is_dup
      |  FROM fp
      |)
      |SELECT s.doc_id, s.quality
      |FROM scored s JOIN dup d ON s.doc_id = d.doc_id
      |WHERE d.is_dup = 0 AND s.lang_pred = 'en' AND s.quality >= 0.6
      |ORDER BY s.doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("tx01_token_stats", tx01TokenStats, Some(tx01Sql)),
    Q("tx02_quality", tx02Quality, Some(tx02Sql)),
    Q("tx03_lang_id", tx03LangId, Some(tx03Sql)),
    Q("tx04_token_freq", tx04TokenFreq, Some(tx04Sql)),
    Q("tx05_fingerprint", tx05Fingerprint, Some(tx05Sql)),
    Q("tx06_bpe_pieces", tx06BpePieces, Some(tx06Sql)),
    Q("tx07_curate", tx07Curate, Some(tx07Sql)),
  )
}
