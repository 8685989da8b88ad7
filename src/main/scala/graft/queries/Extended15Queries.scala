package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextStats

/** Round-7 eleventh wave: containment similarity (Broder's C(A,B) —
  * the asymmetric measure that catches a short document embedded
  * inside a long one, which symmetric Jaccard structurally misses
  * when sizes differ) and a k-NN majority-vote classifier (the
  * non-parametric member of the verified-trainer family).
  */
object Extended15Queries {

  // ---------------------------------------------------------------- dd19

  /** Shingle-set containment: pairs where ≥ 80% of the SMALLER
    * document's 3-gram shingles appear in the other document.
    * Jaccard on a 50-shingle doc inside a 500-shingle doc tops out at
    * 0.1 — below any dedup threshold — while containment reads 1.0;
    * this is the quote/excerpt/subset-duplicate detector. Same
    * inverted-index candidate generation as dd02/dd18 (48-bit hashed
    * shingles, equi-join, Σ bucket² containment), direction decided
    * per pair by which side is smaller.
    */
  private def dd19Containment(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 2)")).as("i"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Hash48(
        expr("concat_ws(' ', slice(toks, i, 3))")).as("h"))
      .distinct().localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("containment",
        round(col("inter") / least(col("sz_a"), col("sz_b")).cast("double"), 4))
      .withColumn("jaccard", round(col("inter") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("containment") >= 0.8)
      .select(col("doc_a"), col("doc_b"),
        when(col("sz_a") <= col("sz_b"), col("doc_a")).otherwise(col("doc_b"))
          .as("contained_doc"),
        col("containment"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val dd19Sql =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS ts
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 12))::BIGINT AS h
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
      |        FROM t0 WHERE len(ts) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i.doc_a, i.doc_b,
      |  CASE WHEN za.sz <= zb.sz THEN i.doc_a ELSE i.doc_b END AS contained_doc,
      |  round(i.inter / CAST(least(za.sz, zb.sz) AS DOUBLE), 4) AS containment,
      |  round(i.inter / CAST(za.sz + zb.sz - i.inter AS DOUBLE), 4) AS jaccard
      |FROM inter i
      |  JOIN sizes za ON za.doc_id = i.doc_a
      |  JOIN sizes zb ON zb.doc_id = i.doc_b
      |WHERE round(i.inter / CAST(least(za.sz, zb.sz) AS DOUBLE), 4) >= 0.8
      |ORDER BY i.doc_a, i.doc_b""".stripMargin

  // ---------------------------------------------------------------- ml17

  /** k-NN majority-vote classifier over the embedding table: vectors
    * with vec_id < 20 are test queries, the rest vote with their 5
    * nearest cosine neighbors (rounded-cosine rank, neighbor-id
    * tie-break — cross-engine stable); majority label with lowest-
    * label tie-break. Output: per-query prediction plus the vote
    * count. The non-parametric member of the trainer family — no
    * training pass at all, the "model" IS the corpus.
    */
  private def ml17Knn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // norms (and with them the scoringNorm corruption screen — an
    // interpreted per-element pass) are staged PER ROW before the
    // crossJoin, the Ann/cosinePairs staging discipline: inside the
    // post-join projection they would evaluate once per PAIR
    val test = emb.filter(col("vec_id") < 20)
      .withColumn("qn", graft.functions.VectorExprs.scoringNorm(col("embedding")))
    val corpus = emb.filter(col("vec_id") >= 20)
      .withColumn("cn", graft.functions.VectorExprs.scoringNorm(col("embedding")))
    // the bounded side is ALWAYS the test set (20 rows) — broadcast it
    // explicitly rather than trusting the planner's size estimate;
    // the corpus side must never be broadcast (it scales with data).
    // Plan2Spec pins both directions.
    val pairs = broadcast(test.as("q")).crossJoin(corpus.as("c"))
      .select(col("q.vec_id").as("query_id"), col("q.label").as("actual"),
        col("c.vec_id").as("neighbor_id"), col("c.label").as("vote"),
        // cosineWithNorms' full inert-NULL contract: zero-magnitude →
        // NULL (not an ANSI DIVIDE_BY_ZERO abort), NaN/NULL element →
        // NULL (via the staged scoringNorm), length-mismatched →
        // NULL (a truncated vector's silent prefix cosine could crack
        // the vote — the r12 chaos-parity class)
        round(graft.functions.VectorExprs.cosineWithNorms(
          col("q.embedding"), col("c.embedding"),
          col("q.qn"), col("c.cn")), 6).as("cos"))
      // unscoreable pairs are dropped, not ranked (Ann tail contract)
      .filter(col("cos").isNotNull)
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val top5 = pairs.withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= 5)
    val votes = top5.groupBy(col("query_id"), col("actual"), col("vote"))
      .agg(count(lit(1)).as("n_votes"))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("vote"))
    votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
      .select(col("query_id"), col("actual"), col("vote").as("pred"),
        col("n_votes"), (col("vote") === col("actual")).as("correct"))
      .orderBy(col("query_id"))
  }

  private val ml17Sql =
    s"""WITH e AS (SELECT vec_id, label, v FROM ${OracleVec.EmbFinite} t),
      |test AS (SELECT * FROM e WHERE vec_id < 20),
      |corpus AS (SELECT * FROM e WHERE vec_id >= 20),
      |pairs AS (
      |  SELECT q.vec_id AS query_id, q.label AS actual,
      |    c.vec_id AS neighbor_id, c.label AS vote,
      |    round(${OracleVec.cosPair("q.v", "c.v")}, 6) AS cos
      |  FROM test q CROSS JOIN corpus c),
      |top5 AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      |    FROM pairs WHERE cos IS NOT NULL)
      |  WHERE rk <= 5),
      |votes AS (
      |  SELECT query_id, actual, vote, count(*) AS n_votes
      |  FROM top5 GROUP BY 1, 2, 3)
      |SELECT query_id, actual, vote AS pred, CAST(n_votes AS BIGINT) AS n_votes,
      |  vote = actual AS correct
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY n_votes DESC, vote) AS vr
      |  FROM votes)
      |WHERE vr = 1
      |ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- ml18

  /** Per-class precision/recall/F1 for the Naive Bayes classifier —
    * derived from the SAME predictions ml14's confusion matrix
    * aggregates ([[Extended10Queries.nbPreds]]), so the two gates are
    * two views of one verified model. A class never predicted gets
    * precision 0 by convention (not NULL — the report is a metric
    * table, not a join artifact); F1 is 0 when P+R = 0.
    */
  private def ml18NbPrf(s: SparkSession, dir: String): DataFrame = {
    val conf = Extended10Queries.nbPreds(s, dir)
      .groupBy(col("actual"), col("pred")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val byActual = conf.groupBy(col("actual").as("cls"))
      .agg(sum(col("n")).as("na"),
        sum(when(col("pred") === col("actual"), col("n")).otherwise(0L)).as("tp"))
    val byPred = conf.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).as("np"))
    byActual.join(byPred, Seq("cls"), "left")
      .select(col("cls"), col("tp"), col("na"),
        coalesce(col("np"), lit(0L)).as("np"))
      .withColumn("precision",
        round(when(col("np") === 0, 0.0)
          .otherwise(col("tp") / col("np").cast("double")), 4))
      .withColumn("recall", round(col("tp") / col("na").cast("double"), 4))
      .withColumn("f1",
        round(when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))), 4))
      .select(col("cls"), col("tp"), col("na"), col("np"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("cls"))
  }

  private val ml18Sql =
    Extended10Queries.nbPredsSqlPrefix + """,
      |conf AS (
      |  SELECT actual, pred, count(*) AS n FROM preds GROUP BY 1, 2),
      |by_actual AS (
      |  SELECT actual AS cls, sum(n) AS na,
      |    sum(CASE WHEN pred = actual THEN n ELSE 0 END) AS tp
      |  FROM conf GROUP BY 1),
      |by_pred AS (SELECT pred AS cls, sum(n) AS np FROM conf GROUP BY 1),
      |j AS (
      |  SELECT a.cls, CAST(a.tp AS BIGINT) AS tp, CAST(a.na AS BIGINT) AS na,
      |    CAST(coalesce(p.np, 0) AS BIGINT) AS np
      |  FROM by_actual a LEFT JOIN by_pred p USING (cls)),
      |m AS (
      |  SELECT cls, tp, na, np,
      |    round(CASE WHEN np = 0 THEN 0.0 ELSE tp / CAST(np AS DOUBLE) END, 4)
      |      AS precision,
      |    round(tp / CAST(na AS DOUBLE), 4) AS recall
      |  FROM j)
      |SELECT cls, tp, na, np, precision, recall,
      |  round(CASE WHEN precision + recall = 0.0 THEN 0.0
      |    ELSE 2 * precision * recall / (precision + recall) END, 4) AS f1
      |FROM m
      |ORDER BY cls""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dd19_containment", dd19Containment, Some(dd19Sql)),
    Q("ml17_knn", ml17Knn, Some(ml17Sql)),
    Q("ml18_nb_prf", ml18NbPrf, Some(ml18Sql)),
  )
}
