package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 second wave: cross-engine-VERIFIED model training (the
  * ml08/ml05b snapped-iteration technique applied to gradient descent
  * and Lloyd's algorithm), graph triangle counting, and a
  * deterministic Bloom-filter gate for the runtime-filter family.
  *
  * The training gates matter because they close the last "rows-only
  * because training is opaque" excuse for a whole model class: GBT
  * internals are genuinely irreproducible in SQL (conceded, rows-only),
  * but logistic regression by batch GD and k-means by Lloyd iterations
  * are pure join+agg arithmetic — so a DuckDB oracle can replay them
  * bit-for-bit when per-iteration state is snapped to 8 dp
  * (half-away-from-zero, both engines), exactly like PageRank (q74)
  * and power-iteration PCA (ml08/ml05b).
  */
object Extended7Queries {

  /** 8-dp half-away-from-zero snap — matches SQL round() tie behavior
    * (Scala's bare math.round is half-toward-+infinity, which diverges
    * on negative iterates; see MlQueries.snap8).
    */
  private def snap8(x: Double): Double =
    math.signum(x) * math.round(math.abs(x) * 1e8) / 1e8

  // ---------------------------------------------------------------- ml11

  /** Logistic regression trained by 5 unrolled batch-gradient-descent
    * steps, every weight update snapped to 8 dp in BOTH engines — the
    * first fully hash-verified model TRAINING gate (ml03's GBT is
    * rows-only by necessity; this one has no excuse and gets none).
    * Task: predict l_returnflag='R' from (quantity, discount, tax),
    * unit-scaled, intercept included, lr=1.
    *
    * Scale shape: each step is ONE map-side-combined average over the
    * feature frame (4 conditional sums) — the classic distributed
    * mini-batch GD shape with bounded (4-double) driver state; the
    * projected feature frame is persisted once and scanned 6× (5 steps
    * + metrics). No per-row state, no global sort, nothing driver-side
    * beyond the weight vector itself.
    */
  /** The ml11 feature frame — shared with ml16's calibration gate. */
  private[queries] def logregFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"),
      (col("l_quantity") / 50.0).as("x1"),
      (col("l_discount") * 10.0).as("x2"),
      (col("l_tax") * 10.0).as("x3"))

  /** The 5 snapped GD steps over an (already persisted) feature frame —
    * shared with ml16 so calibration scores the identical model.
    */
  private[queries] def logregWeights(f: DataFrame): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 5) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val e = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
      val g = f.agg(avg(e).as("g0"), avg(e * col("x1")).as("g1"),
        avg(e * col("x2")).as("g2"), avg(e * col("x3")).as("g3")).first()
      w = Array.tabulate(4)(j => snap8(w(j) - g.getDouble(j)))
    }
    w
  }

  private def ml11Logreg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = logregFeatures(s, dir).persist()
    try {
      val w = logregWeights(f)
      // final-model quality metrics: p>=0.5 ⟺ z>=0 (no float sigmoid in
      // the decision), log-loss clamped away from 0/1 by the sigmoid
      // itself (|z| is small); rounded 4 dp — partial-agg order drift
      // is ~1e-12, far below the rounding step
      val z = lit(w(0)) + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val m = f.agg(
        avg(when((z >= 0) === (col("y") === 1.0), 1.0).otherwise(0.0)).as("acc"),
        avg(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p)))
          .as("ll")).first()
      Seq(
        ("accuracy", math.round(m.getDouble(0) * 1e4) / 1e4),
        ("logloss", math.round(m.getDouble(1) * 1e4) / 1e4),
        ("w_disc", w(2)), ("w_intercept", w(0)), ("w_qty", w(1)),
        ("w_tax", w(3))).toDF("name", "value").orderBy(col("name"))
    } finally f.unpersist()
  }

  /** WITH-prefix shared by ml11's and ml16's oracles: the feature CTE
    * plus the 5 GD-step CTEs ending at w5.
    */
  private[queries] val logregPrefixSql: String = {
    // one CTE per GD step; MATERIALIZED so DuckDB doesn't inline the
    // recurrence exponentially (the ml05b lesson)
    def step(k: Int) =
      s"""w$k AS MATERIALIZED (
         |  SELECT round(min(pw0) - avg(e), 8) AS w0,
         |    round(min(pw1) - avg(e * x1), 8) AS w1,
         |    round(min(pw2) - avg(e * x2), 8) AS w2,
         |    round(min(pw3) - avg(e * x3), 8) AS w3
         |  FROM (
         |    SELECT f.*, w.w0 AS pw0, w.w1 AS pw1, w.w2 AS pw2, w.w3 AS pw3,
         |      1.0 / (1.0 + exp(-(w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))) - f.y AS e
         |    FROM f CROSS JOIN w${k - 1} w))""".stripMargin
    val steps = (1 to 5).map(step).mkString(",\n")
    """WITH f AS MATERIALIZED (
      |  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
      |    l_quantity / 50.0 AS x1, l_discount * 10.0 AS x2, l_tax * 10.0 AS x3
      |  FROM lineitem),
      |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
      |""".stripMargin + steps
  }

  private val ml11Sql = {
    logregPrefixSql + """,
      |m AS (
      |  SELECT
      |    round(avg(CASE WHEN (z >= 0) = (y = 1.0) THEN 1.0 ELSE 0.0 END), 4) AS acc,
      |    round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 4) AS ll
      |  FROM (
      |    SELECT f.y, w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 AS z,
      |      1.0 / (1.0 + exp(-(w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))) AS p
      |    FROM f CROSS JOIN w5 w))
      |SELECT name, value FROM (
      |  SELECT 'accuracy' AS name, acc AS value FROM m
      |  UNION ALL SELECT 'logloss', ll FROM m
      |  UNION ALL SELECT 'w_intercept', w0 FROM w5
      |  UNION ALL SELECT 'w_qty', w1 FROM w5
      |  UNION ALL SELECT 'w_disc', w2 FROM w5
      |  UNION ALL SELECT 'w_tax', w3 FROM w5)
      |ORDER BY name""".stripMargin
  }

  // ---------------------------------------------------------------- ml12

  /** K-means (k=4, 2-d) by 3 unrolled Lloyd iterations with snapped
    * centroids — hash-verified clustering the same way ml11 verifies
    * GD. Points are (l_quantity, l_extendedprice/10000); fixed literal
    * init; assignment breaks distance ties toward the lower cluster id
    * via the same `<=` CASE chain in both engines; an empty cluster
    * keeps its previous centroid (coalesce).
    *
    * Scale shape: each iteration is ONE conditional-aggregate pass (8
    * avgs, map-side combined) with k×d = 8 doubles of driver state —
    * exactly how MLlib's own KMeans distributes (runs + treeAggregate),
    * minus the unverifiable parts.
    */
  private def ml12Kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("double").as("x"),
      (col("l_extendedprice") / 10000.0).as("yv")).persist()
    var cx = Array(10.0, 20.0, 30.0, 40.0)
    var cy = Array(1.0, 3.0, 5.0, 7.0)
    def assignExpr = {
      val d = (0 until 4).map(j =>
        (col("x") - lit(cx(j))) * (col("x") - lit(cx(j))) +
          (col("yv") - lit(cy(j))) * (col("yv") - lit(cy(j))))
      when(d(0) <= d(1) && d(0) <= d(2) && d(0) <= d(3), 0)
        .when(d(1) <= d(2) && d(1) <= d(3), 1)
        .when(d(2) <= d(3), 2).otherwise(3)
    }
    try {
      for (_ <- 1 to 3) {
        val cl = assignExpr
        val aggs = (0 until 4).map(j => avg(when(cl === j, col("x"))).as(s"cx$j")) ++
          (0 until 4).map(j => avg(when(cl === j, col("yv"))).as(s"cy$j"))
        val r = pts.agg(aggs.head, aggs.tail: _*).first()
        cx = Array.tabulate(4)(j =>
          if (r.isNullAt(j)) cx(j) else snap8(r.getDouble(j)))
        cy = Array.tabulate(4)(j =>
          if (r.isNullAt(4 + j)) cy(j) else snap8(r.getDouble(4 + j)))
      }
      val cl = assignExpr
      val d = (0 until 4).map(j =>
        (col("x") - lit(cx(j))) * (col("x") - lit(cx(j))) +
          (col("yv") - lit(cy(j))) * (col("yv") - lit(cy(j))))
      val dist = sqrt((0 until 4).foldLeft(lit(Double.MaxValue))((acc, j) =>
        when(cl === j, d(j)).otherwise(acc)))
      pts.select(cl.as("cluster"), col("x"), col("yv"), dist.as("dist"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), round(avg(col("dist")), 4).as("avg_dist"))
        .join(
          (0 until 4).map(j => (j, cx(j), cy(j))).toDF("cluster", "cx", "cy"),
          Seq("cluster"), "right")
        .select(col("cluster"), coalesce(col("n"), lit(0L)).as("n"),
          col("cx"), col("cy"), col("avg_dist"))
        .orderBy(col("cluster"))
    } finally pts.unpersist()
  }

  private val ml12Sql = {
    def assign(prev: String) =
      s"""SELECT p.x, p.yv,
         |      CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
         |           WHEN d1 <= d2 AND d1 <= d3 THEN 1
         |           WHEN d2 <= d3 THEN 2 ELSE 3 END AS cl,
         |      d0, d1, d2, d3
         |    FROM (
         |      SELECT p0.x, p0.yv,
         |        (p0.x-c.cx0)*(p0.x-c.cx0) + (p0.yv-c.cy0)*(p0.yv-c.cy0) AS d0,
         |        (p0.x-c.cx1)*(p0.x-c.cx1) + (p0.yv-c.cy1)*(p0.yv-c.cy1) AS d1,
         |        (p0.x-c.cx2)*(p0.x-c.cx2) + (p0.yv-c.cy2)*(p0.yv-c.cy2) AS d2,
         |        (p0.x-c.cx3)*(p0.x-c.cx3) + (p0.yv-c.cy3)*(p0.yv-c.cy3) AS d3
         |      FROM pts p0 CROSS JOIN $prev c) p""".stripMargin
    def step(k: Int) =
      s"""c$k AS MATERIALIZED (
         |  SELECT
         |    round(coalesce(avg(CASE WHEN cl = 0 THEN x END), min(pcx0)), 8) AS cx0,
         |    round(coalesce(avg(CASE WHEN cl = 1 THEN x END), min(pcx1)), 8) AS cx1,
         |    round(coalesce(avg(CASE WHEN cl = 2 THEN x END), min(pcx2)), 8) AS cx2,
         |    round(coalesce(avg(CASE WHEN cl = 3 THEN x END), min(pcx3)), 8) AS cx3,
         |    round(coalesce(avg(CASE WHEN cl = 0 THEN yv END), min(pcy0)), 8) AS cy0,
         |    round(coalesce(avg(CASE WHEN cl = 1 THEN yv END), min(pcy1)), 8) AS cy1,
         |    round(coalesce(avg(CASE WHEN cl = 2 THEN yv END), min(pcy2)), 8) AS cy2,
         |    round(coalesce(avg(CASE WHEN cl = 3 THEN yv END), min(pcy3)), 8) AS cy3
         |  FROM (
         |    SELECT q.*, c.cx0 AS pcx0, c.cx1 AS pcx1, c.cx2 AS pcx2, c.cx3 AS pcx3,
         |      c.cy0 AS pcy0, c.cy1 AS pcy1, c.cy2 AS pcy2, c.cy3 AS pcy3
         |    FROM (
         |    ${assign(s"c${k - 1}")}) q CROSS JOIN c${k - 1} c))""".stripMargin
    """WITH pts AS MATERIALIZED (
      |  SELECT CAST(l_quantity AS DOUBLE) AS x, l_extendedprice / 10000.0 AS yv
      |  FROM lineitem),
      |c0 AS (SELECT 10.0 AS cx0, 20.0 AS cx1, 30.0 AS cx2, 40.0 AS cx3,
      |              1.0 AS cy0, 3.0 AS cy1, 5.0 AS cy2, 7.0 AS cy3),
      |""".stripMargin +
      (1 to 3).map(step).mkString(",\n") + s""",
      |assigned AS (
      |  SELECT cl,
      |    sqrt(CASE cl WHEN 0 THEN d0 WHEN 1 THEN d1 WHEN 2 THEN d2 ELSE d3 END)
      |      AS dist
      |  FROM (
      |    ${assign("c3")}) a),
      |agg AS (
      |  SELECT cl AS cluster, count(*) AS n, round(avg(dist), 4) AS avg_dist
      |  FROM assigned GROUP BY 1),
      |cents AS (
      |  SELECT 0 AS cluster, cx0 AS cx, cy0 AS cy FROM c3
      |  UNION ALL SELECT 1, cx1, cy1 FROM c3
      |  UNION ALL SELECT 2, cx2, cy2 FROM c3
      |  UNION ALL SELECT 3, cx3, cy3 FROM c3)
      |SELECT c.cluster, CAST(coalesce(a.n, 0) AS BIGINT) AS n, c.cx, c.cy,
      |  a.avg_dist
      |FROM cents c LEFT JOIN agg a USING (cluster)
      |ORDER BY c.cluster""".stripMargin
  }

  // ---------------------------------------------------------------- q90

  /** Graph triangle count + global clustering coefficient over the
    * supplier co-occurrence graph (suppliers sharing an order, subgraph
    * suppkey < 100 so the demo graph is constant-size across SFs while
    * the scan stays full-table). Edges are canonicalized u < v once, so
    * the triangle join enumerates each triangle exactly once
    * (u < v < w — the "compact-forward" algorithm; at 100 TB you'd
    * additionally orient edges by degree to bound the wedge fan-out,
    * which this ordering approximates on near-uniform degrees).
    */
  private def q90Triangles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_suppkey") < 100)
      .select(col("l_orderkey"), col("l_suppkey"))
    val e = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .distinct().localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("u").as("node")).union(e.select(col("v")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(sum(col("deg") * (col("deg") - 1) / 2).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    edges.crossJoin(tri).crossJoin(wedges)
      .select(col("n_edges"), col("n_triangles"),
        col("n_wedges").cast("long").as("n_wedges"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("transitivity"))
  }

  private val q90Sql =
    """WITH e AS (
      |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      |  WHERE a.l_suppkey < 100 AND b.l_suppkey < 100),
      |tri AS (
      |  SELECT count(*) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e2.u = e1.v
      |       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |deg AS (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY 1),
      |wedges AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges FROM deg),
      |edges AS (SELECT count(*) AS n_edges FROM e)
      |SELECT edges.n_edges, tri.n_triangles, wedges.n_wedges,
      |  round(3.0 * tri.n_triangles / wedges.n_wedges, 6) AS transitivity
      |FROM edges CROSS JOIN tri CROSS JOIN wedges""".stripMargin

  // ---------------------------------------------------------------- q91

  /** Deterministic Bloom-filter membership — the runtime-filter /
    * semi-join-pruning primitive, built so the DuckDB oracle constructs
    * the IDENTICAL filter: m = 65536 bits as 2048 32-bit words (bit
    * values stay < 2^31, so no sign traps in either engine), k = 4
    * md5-derived hash functions. Members are customers with a
    * > 250k-total order; every customer is probed; the gate reports
    * measured false positives against the exact semi-join.
    *
    * Scale shape: the filter build is ONE bit_or aggregate (map-side
    * combined, ≤ 2048 result rows no matter the corpus); the probe
    * broadcasts those 2048 words. This is exactly how a runtime filter
    * prunes a 100 TB fact scan before an expensive join — and why the
    * filter, not the dimension table, is what you ship to executors.
    */
  private def q91BloomFilter(s: SparkSession, dir: String): DataFrame = {
    val seeds = array((0 until 4).map(lit): _*)
    def pos(keyCol: Column): (Column, Column) = {
      val h = graft.dedup.Dedup.md5Hash48(
        concat_ws(":", col("seed"), keyCol.cast("string"))) % 65536
      (floor(h / 32).cast("long").as("word"),
        call_function("shiftleft", lit(1L), (h % 32).cast("int")).as("bitv"))
    }
    val members = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 250000)
      .select(col("o_custkey")).distinct().localCheckpoint()
    val mseed = members.select(col("o_custkey"), explode(seeds).as("seed"))
    val (mw, mb) = pos(col("o_custkey"))
    val bloom = mseed.select(mw, mb)
      .groupBy(col("word")).agg(bit_or(col("bitv")).as("bits"))
    val probes = Tables.customer(s, dir)
      .select(col("c_custkey"), explode(seeds).as("seed"))
    val (pw, pb) = pos(col("c_custkey"))
    val hits = probes.select(col("c_custkey"), pw, pb)
      .join(broadcast(bloom), Seq("word"), "left")
      .groupBy(col("c_custkey"))
      .agg(sum(when(col("bits").bitwiseAND(col("bitv")) === col("bitv"), 1)
        .otherwise(0)).as("n_seed_hits"))
      .filter(col("n_seed_hits") === 4)
    val truth = Tables.customer(s, dir)
      .join(members, col("c_custkey") === col("o_custkey"), "left_semi")
    val nm = members.agg(count(lit(1)).as("n_members"))
    val np = Tables.customer(s, dir).agg(count(lit(1)).as("n_probes"))
    val nh = hits.agg(count(lit(1)).as("n_bloom_pass"))
    val nt = truth.agg(count(lit(1)).as("n_true_pass"))
    nm.crossJoin(np).crossJoin(nh).crossJoin(nt)
      .select(col("n_members"), col("n_probes"), col("n_bloom_pass"),
        col("n_true_pass"),
        (col("n_bloom_pass") - col("n_true_pass")).as("n_false_pos"),
        round((col("n_bloom_pass") - col("n_true_pass")) /
          (col("n_probes") - col("n_true_pass")).cast("double"), 6)
          .as("fp_rate"))
  }

  private val q91Sql =
    """WITH members AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 250000),
      |seeds AS (SELECT unnest(range(0, 4)) AS seed),
      |bloom AS (
      |  SELECT h // 32 AS word, bit_or(1::BIGINT << CAST(h % 32 AS INTEGER)) AS bits
      |  FROM (
      |    SELECT ('0x' || substr(md5(s.seed || ':' || m.o_custkey), 1, 12))::BIGINT
      |      % 65536 AS h
      |    FROM members m CROSS JOIN seeds s)
      |  GROUP BY 1),
      |probe AS (
      |  SELECT c.c_custkey, p.h // 32 AS word,
      |    1::BIGINT << CAST(p.h % 32 AS INTEGER) AS bitv
      |  FROM customer c CROSS JOIN seeds s,
      |    LATERAL (SELECT ('0x' || substr(md5(s.seed || ':' || c.c_custkey), 1, 12))::BIGINT
      |      % 65536 AS h) p),
      |hits AS (
      |  SELECT p.c_custkey
      |  FROM probe p LEFT JOIN bloom b USING (word)
      |  GROUP BY 1
      |  HAVING sum(CASE WHEN (b.bits & p.bitv) = p.bitv THEN 1 ELSE 0 END) = 4),
      |nh AS (SELECT count(*) AS n_bloom_pass FROM hits),
      |nt AS (SELECT count(*) AS n_true_pass
      |       FROM customer WHERE c_custkey IN (SELECT o_custkey FROM members)),
      |nm AS (SELECT count(*) AS n_members FROM members),
      |np AS (SELECT count(*) AS n_probes FROM customer)
      |SELECT nm.n_members, np.n_probes, nh.n_bloom_pass, nt.n_true_pass,
      |  nh.n_bloom_pass - nt.n_true_pass AS n_false_pos,
      |  round((nh.n_bloom_pass - nt.n_true_pass)
      |    / CAST(np.n_probes - nt.n_true_pass AS DOUBLE), 6) AS fp_rate
      |FROM nm CROSS JOIN np CROSS JOIN nh CROSS JOIN nt""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ml11_logreg", ml11Logreg, Some(ml11Sql)),
    Q("ml12_kmeans", ml12Kmeans, Some(ml12Sql)),
    Q("q90_triangles", q90Triangles, Some(q90Sql)),
    Q("q91_bloom_filter", q91BloomFilter, Some(q91Sql)),
  )
}
