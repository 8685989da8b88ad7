package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 fifth wave: closed-form least squares (the third
  * hash-verified trainer, after ml11's GD and ml12's Lloyd), a blocked
  * edit-distance fuzzy join (entity resolution), and CDC-chunk overlap
  * dedup (composing tx20's chunker into the dedup family).
  */
object Extended9Queries {

  // ---------------------------------------------------------------- ml13

  /** Ordinary least squares solved in CLOSED FORM — distributed moment
    * accumulation + Cramer's rule, with a KNOWN-ANSWER target: the
    * synthetic star schema draws its numeric columns independently
    * (corr(quantity, price) ≈ −0.01, so any natural regression here is
    * noise), so the gate regresses the exact linear blend
    * y = 100·x1 − x2 (gross minus discount basis points over rounded
    * dollars) and must recover β = (0, 100, −1), R² = 1 — the
    * fixed-centroid-gate technique applied to a trainer. Swap y for
    * any numeric column in production; the machinery is unchanged.
    *
    * The moment matrix XᵀX and XᵀY are accumulated as EXACT integer
    * sums (rounded dollars × basis points stay well inside long/
    * HUGEINT) — order-independent, so no snapping is needed anywhere —
    * and the 3×3 normal equations are solved by Cramer's rule in
    * double arithmetic over those exact scalars: both engines execute
    * the identical expression tree on identical inputs, so every
    * coefficient matches bit-for-bit.
    *
    * Scale shape: ONE map-side-combined aggregate over the data (9
    * integer sums); the solve is O(1) scalar arithmetic in-plan. This
    * is the textbook distributed OLS — at 100 TB the moment matrix is
    * still 9 numbers.
    */
  private def ml13Ols(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice"), 0).cast("long").as("q"),
        round(col("l_discount") * 100, 0).cast("long").as("d100"))
      .select(col("q"), (col("q") * col("d100")).as("d"))
      .select(col("q"), col("d"), (col("q") * 100 - col("d")).as("y"))
    val sums = f.agg(
      count(lit(1)).as("n"), sum(col("q")).as("sq"), sum(col("d")).as("sd"),
      sum(col("q") * col("q")).as("sqq"), sum(col("q") * col("d")).as("sqd"),
      sum(col("d") * col("d")).as("sdd"), sum(col("y")).as("sy"),
      sum(col("q") * col("y")).as("sqy"), sum(col("d") * col("y")).as("sdy"),
      // the only non-integer sum; drift is ~1e-14 relative, harmless
      // against SSE magnitudes (analysis in Extended9Spec)
      sum(col("y").cast("double") * col("y").cast("double")).as("syy"))
    // Cramer's rule over the symmetric moment matrix
    //   [ n   sq  sd  ] [b0]   [ sy  ]
    //   [ sq  sqq sqd ] [b1] = [ sqy ]
    //   [ sd  sqd sdd ] [b2]   [ sdy ]
    // IDENTICAL expression order in the DuckDB oracle — double products
    // of the same exact integers are deterministic in both engines.
    val solved = sums.selectExpr(
      "CAST(n AS DOUBLE) AS nd", "CAST(sq AS DOUBLE) AS a12",
      "CAST(sd AS DOUBLE) AS a13", "CAST(sqq AS DOUBLE) AS a22",
      "CAST(sqd AS DOUBLE) AS a23", "CAST(sdd AS DOUBLE) AS a33",
      "CAST(sy AS DOUBLE) AS r1", "CAST(sqy AS DOUBLE) AS r2",
      "CAST(sdy AS DOUBLE) AS r3", "syy", "n")
      .selectExpr("*",
        "nd*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det")
      .selectExpr("*",
        "(r1*(a22*a33 - a23*a23) - a12*(r2*a33 - a23*r3) + a13*(r2*a23 - a22*r3)) / det AS b0",
        "(nd*(r2*a33 - a23*r3) - r1*(a12*a33 - a23*a13) + a13*(a12*r3 - r2*a13)) / det AS b1",
        "(nd*(a22*r3 - r2*a23) - a12*(a12*r3 - r2*a13) + r1*(a12*a23 - a22*a13)) / det AS b2")
      .selectExpr("*",
        "syy - (b0*r1 + b1*r2 + b2*r3) AS sse",
        "syy - r1*r1/nd AS sst")
    solved.selectExpr(
      "floor(b0 * 1e6 + 0.5) / 1e6 AS beta0",
      "floor(b1 * 1e6 + 0.5) / 1e6 AS beta_x1",
      "floor(b2 * 1e6 + 0.5) / 1e6 AS beta_x2",
      "floor((1.0 - sse/sst) * 1e6 + 0.5) / 1e6 AS r2",
      "n")
  }

  private val ml13Sql =
    """WITH f0 AS (
      |  SELECT CAST(round(l_extendedprice, 0) AS BIGINT) AS q,
      |    CAST(round(l_discount * 100, 0) AS BIGINT) AS d100
      |  FROM lineitem),
      |f AS (
      |  SELECT q, q * d100 AS d, q * 100 - q * d100 AS y FROM f0),
      |sums AS (
      |  SELECT count(*) AS n, sum(q) AS sq, sum(d) AS sd,
      |    sum(q * q) AS sqq, sum(q * d) AS sqd, sum(d * d) AS sdd,
      |    sum(y) AS sy, sum(q * y) AS sqy, sum(d * y) AS sdy,
      |    sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy
      |  FROM f),
      |c AS (
      |  SELECT CAST(n AS DOUBLE) AS nd, CAST(sq AS DOUBLE) AS a12,
      |    CAST(sd AS DOUBLE) AS a13, CAST(sqq AS DOUBLE) AS a22,
      |    CAST(sqd AS DOUBLE) AS a23, CAST(sdd AS DOUBLE) AS a33,
      |    CAST(sy AS DOUBLE) AS r1, CAST(sqy AS DOUBLE) AS r2,
      |    CAST(sdy AS DOUBLE) AS r3, syy, n
      |  FROM sums),
      |d1 AS (
      |  SELECT *,
      |    nd*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det
      |  FROM c),
      |b AS (
      |  SELECT *,
      |    (r1*(a22*a33 - a23*a23) - a12*(r2*a33 - a23*r3) + a13*(r2*a23 - a22*r3)) / det AS b0,
      |    (nd*(r2*a33 - a23*r3) - r1*(a12*a33 - a23*a13) + a13*(a12*r3 - r2*a13)) / det AS b1,
      |    (nd*(a22*r3 - r2*a23) - a12*(a12*r3 - r2*a13) + r1*(a12*a23 - a22*a13)) / det AS b2
      |  FROM d1),
      |e AS (
      |  SELECT *, syy - (b0*r1 + b1*r2 + b2*r3) AS sse, syy - r1*r1/nd AS sst
      |  FROM b)
      |SELECT floor(b0 * 1e6 + 0.5) / 1e6 AS beta0,
      |  floor(b1 * 1e6 + 0.5) / 1e6 AS beta_x1,
      |  floor(b2 * 1e6 + 0.5) / 1e6 AS beta_x2,
      |  floor((1.0 - sse/sst) * 1e6 + 0.5) / 1e6 AS r2,
      |  n
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- q95

  /** Blocked edit-distance fuzzy join (entity resolution): near-match
    * pairs of distinct part names within Levenshtein distance 3,
    * blocked on the head noun (last token) so no all-pairs comparison
    * ever happens — the block key bounds candidate fan-out to
    * Σ block², the same containment argument as the LSH band joins.
    * Matching runs on the DISTINCT name vocabulary (entity resolution
    * always does), so row count is irrelevant to the match cost.
    */
  private def q95EditJoin(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .select(col("p_name")).distinct()
      .select(col("p_name"), element_at(split(col("p_name"), " "), -1).as("blk"))
      .localCheckpoint()
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      .filter(col("dist") <= 3)
      .orderBy(col("name_a"), col("name_b"))
  }

  private val q95Sql =
    """WITH names AS (
      |  SELECT DISTINCT p_name,
      |    list_extract(regexp_split_to_array(p_name, ' '), -1) AS blk
      |  FROM part)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
      |FROM names a JOIN names b
      |  ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a, name_b""".stripMargin

  // ---------------------------------------------------------------- dd17

  /** CDC-chunk overlap near-dup detection — tx20's content-defined
    * chunker composed into the dedup family: documents are near-dups
    * when ≥ 40% of the smaller document's chunk fingerprints also
    * appear in the other. The pair generation is an inverted-index
    * join on the 48-bit chunk fingerprint (longs only — never text),
    * the same Σ bucket² containment as dd02/dd04.
    */
  private def dd17ChunkOverlap(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(graft.text.TextStats.tokens(col("text"))).as(Seq("pos", "tok")))
    val flagged = toks.withColumn("boundary",
      when(col("pos") === 0 ||
        graft.dedup.Dedup.md5Hash48(col("tok")) % 8 === 0, 1).otherwise(0))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val chunks = flagged
      .withColumn("chunk", sum(col("boundary")).over(wd))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(graft.dedup.Dedup.md5Hash48(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")))).as("fp"))
      .select(col("doc_id"), col("fp")).distinct().localCheckpoint()
    val sizes = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
    val shared = chunks.as("a").join(chunks.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nc", "nc_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nc", "nc_b"), "doc_b")
      .withColumn("overlap",
        round(col("n_shared") / least(col("nc_a"), col("nc_b")).cast("double"), 4))
      .filter(col("overlap") >= 0.4)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("overlap"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val dd17Sql =
    """WITH toks AS (
      |  SELECT doc_id, pos - 1 AS pos, t[pos] AS tok
      |  FROM (
      |    SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos
      |    FROM (
      |      SELECT doc_id,
      |        list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS t
      |      FROM documents) d0) d1),
      |chunked AS (
      |  SELECT doc_id, tok, pos,
      |    sum(CASE WHEN pos = 0
      |      OR ('0x' || substr(md5(tok), 1, 12))::BIGINT % 8 = 0
      |      THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
      |  FROM toks),
      |chunks AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 12))::BIGINT AS fp
      |  FROM chunked GROUP BY doc_id, chunk),
      |sizes AS (SELECT doc_id, count(*) AS nc FROM chunks GROUP BY 1),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      |  FROM chunks a JOIN chunks b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT s.doc_a, s.doc_b, CAST(s.n_shared AS BIGINT) AS n_shared,
      |  round(s.n_shared / CAST(least(za.nc, zb.nc) AS DOUBLE), 4) AS overlap
      |FROM shared s
      |  JOIN sizes za ON za.doc_id = s.doc_a
      |  JOIN sizes zb ON zb.doc_id = s.doc_b
      |WHERE round(s.n_shared / CAST(least(za.nc, zb.nc) AS DOUBLE), 4) >= 0.4
      |ORDER BY s.doc_a, s.doc_b""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ml13_ols", ml13Ols, Some(ml13Sql)),
    Q("q95_edit_join", q95EditJoin, Some(q95Sql)),
    Q("dd17_chunk_overlap", dd17ChunkOverlap, Some(dd17Sql)),
  )
}
