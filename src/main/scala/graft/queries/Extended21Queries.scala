package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 second wave: the event-analytics staples every product
  * warehouse runs daily — retention cohorts, ordered conversion
  * funnels, rolling active-user counts, an experiment (A/B) readout —
  * plus the referential-integrity audit that completes the
  * data-quality family (dq01 constraints, dq02 drift, dq03 Benford,
  * dq04 this). All five are plain multi-aggregate DAGs: shuffles only
  * on user_id / join keys, every small side broadcast, no global
  * windows.
  */
object Extended21Queries {

  /** Weekly retention cohorts on purchase activity: cohort = the week
    * (Monday-truncated) of a user's FIRST purchase; a cohort member is
    * retained in week k if they purchased in cohort_week + k. Two
    * aggregations over user_id plus a broadcast join of the per-cohort
    * sizes (bounded by the number of calendar weeks, not users).
    */
  private def q105RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val first = p.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val act = p.join(first, "user_id")
      .select(col("user_id"), col("cohort_week"),
        expr("CAST(datediff(date_trunc('week', ts), cohort_week) DIV 7 AS INT)")
          .as("week_offset"))
      .distinct()
    val sizes = first.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    act.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      // string-format the week: Spark's parquet timestamps round-trip
      // as ns where the DuckDB oracle yields µs (q60's convention)
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active") / col("cohort_size"), 4).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val q105Sql =
    """WITH p AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |first AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM p GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT p.user_id, f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, date_trunc('week', p.ts)) // 7 AS INTEGER) AS week_offset
      |  FROM p JOIN first f USING (user_id)),
      |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY 1)
      |SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week, a.week_offset,
      |  CAST(count(*) AS BIGINT) AS n_active,
      |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
      |  round(count(*) / CAST(s.cohort_size AS DOUBLE), 4) AS retention
      |FROM act a JOIN sizes s USING (cohort_week)
      |GROUP BY a.cohort_week, a.week_offset, s.cohort_size
      |ORDER BY cohort_week, a.week_offset""".stripMargin

  /** Strictly-ordered conversion funnel with a 24 h step deadline:
    * signup → first view within 24 h → first click within 24 h of that
    * view → first purchase within 24 h of that click. Each stage is
    * one shrinking groupBy(user) aggregate chained by an equi-join on
    * user_id — the min-chaining formulation that needs no per-user
    * event sort and no window. Timestamps compared as exact integer
    * microseconds (q75's convention).
    */
  private def q106EventFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val day = 86400000000L
    def stage(prev: DataFrame, prevT: String, typ: String, out: String) =
      e.filter(col("event_type") === typ).join(prev, "user_id")
        .filter(col("us") > col(prevT) && col("us") <= col(prevT) + lit(day))
        .groupBy(col("user_id")).agg(min(col("us")).as(out))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val s2 = stage(s1, "t1", "view", "t2")
    val s3 = stage(s2, "t2", "click", "t3")
    val s4 = stage(s3, "t3", "purchase", "t4")
    val start = s1.agg(count(lit(1)).as("n_start"))
    def cnt(df: DataFrame, idx: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"), col("n_users"))
    cnt(s1, 1, "signup").union(cnt(s2, 2, "view"))
      .union(cnt(s3, 3, "click")).union(cnt(s4, 4, "purchase"))
      .crossJoin(broadcast(start))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(col("n_users") / col("n_start"), 4).as("pct_of_start"))
      .orderBy(col("stage_idx"))
  }

  private val q106Sql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'view' AND e.us > s1.t1 AND e.us <= s1.t1 + 86400000000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.us > s2.t2 AND e.us <= s2.t2 + 86400000000 GROUP BY 1),
      |s4 AS (SELECT e.user_id, min(e.us) AS t4 FROM e JOIN s3 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.us > s3.t3 AND e.us <= s3.t3 + 86400000000 GROUP BY 1),
      |f AS (
      |  SELECT 1 AS stage_idx, 'signup' AS stage, count(*) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'view', count(*) FROM s2
      |  UNION ALL SELECT 3, 'click', count(*) FROM s3
      |  UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
      |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  round(n_users / CAST((SELECT n_users FROM f WHERE stage_idx = 1) AS DOUBLE), 4) AS pct_of_start
      |FROM f ORDER BY stage_idx""".stripMargin

  /** Rolling 7-day active users per day (DAU/WAU/stickiness). The
    * scale-safe formulation of distinct-over-sliding-window: dedup to
    * (day, user) once, then each active day contributes to exactly 7
    * report days via a BOUNDED explode — an equi-join groupBy, never a
    * sliding window with a distinct aggregate (which Spark cannot do
    * incrementally) and never a range join. Report days are clamped to
    * days that exist in the data.
    */
  private def q107RollingWau(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
    val days = du.select(col("day")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val fan = du.select(col("user_id"), explode(expr(
        "sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")).as("rday"))
      .distinct()
      .join(days.withColumnRenamed("day", "rday"), "rday")
    fan.groupBy(col("rday")).agg(count(lit(1)).as("wau"))
      .withColumnRenamed("rday", "day")
      .join(dau, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau") / col("wau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  private val q107Sql =
    """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
      |fan AS (
      |  SELECT DISTINCT d2.day AS day, du.user_id
      |  FROM du JOIN days d2 ON d2.day BETWEEN du.day AND du.day + INTERVAL 6 DAY),
      |wau AS (SELECT day, count(*) AS wau FROM fan GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(dau AS BIGINT) AS dau,
      |  CAST(wau AS BIGINT) AS wau,
      |  round(dau / CAST(wau AS DOUBLE), 4) AS stickiness
      |FROM dau JOIN wau USING (day)
      |ORDER BY day""".stripMargin

  /** Deterministic A/B experiment readout: users assigned to two arms
    * by md5-bucket parity (stable across runs/engines — the ml02
    * split rule), conversion = lifetime purchase revenue ≥ 600 (every
    * synthetic user purchases at least once, so any-purchase is
    * saturated — p=1 makes the z denominator exactly 0). Per-arm
    * stats plus the pooled two-proportion z-score, all from two
    * aggregates and a broadcast scalar — the closed-form significance
    * readout, no sampling.
    */
  private def q108AbTest(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Dedup
    val e = Tables.events(s, dir)
    val users = e.select(col("user_id")).distinct()
      .withColumn("arm", pmod(Dedup.md5Hash48(col("user_id").cast("string")), lit(2)).cast("int"))
    val conv = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(col("value")).as("revenue"))
    val perArm = users.join(conv, Seq("user_id"), "left")
      .groupBy(col("arm")).agg(
        count(lit(1)).as("n_users"),
        sum(when(coalesce(col("revenue"), lit(0.0)) >= 600, 1L).otherwise(0L)).as("n_converted"),
        sum(coalesce(col("revenue"), lit(0.0))).as("total_revenue"))
    val z = perArm.agg(
        sum(when(col("arm") === 0, col("n_converted"))).as("c0"),
        sum(when(col("arm") === 0, col("n_users"))).as("n0"),
        sum(when(col("arm") === 1, col("n_converted"))).as("c1"),
        sum(when(col("arm") === 1, col("n_users"))).as("n1"))
      .select((((col("c0") / col("n0")) - (col("c1") / col("n1"))) /
        sqrt((col("c0") + col("c1")) / (col("n0") + col("n1"))
          * (lit(1) - (col("c0") + col("c1")) / (col("n0") + col("n1")))
          * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))).as("z"))
    perArm.crossJoin(broadcast(z))
      .select(col("arm"), col("n_users"), col("n_converted"),
        round(col("n_converted") / col("n_users"), 4).as("conv_rate"),
        round(col("total_revenue") / col("n_users"), 4).as("rev_per_user"),
        round(col("z"), 4).as("z_score"))
      .orderBy(col("arm"))
  }

  private val q108Sql =
    """WITH users AS (
      |  SELECT DISTINCT user_id,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 2 AS INTEGER) AS arm
      |  FROM events),
      |conv AS (
      |  SELECT user_id, sum(value) AS revenue FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |per_arm AS (
      |  SELECT arm, count(*) AS n_users,
      |    sum(CASE WHEN coalesce(c.revenue, 0.0) >= 600 THEN 1 ELSE 0 END) AS n_converted,
      |    sum(coalesce(c.revenue, 0.0)) AS total_revenue
      |  FROM users u LEFT JOIN conv c USING (user_id)
      |  GROUP BY arm),
      |zz AS (
      |  -- pooled terms sum arms 0 and 1 ONLY, like the engine's
      |  -- (c0+c1)/(n0+n1): a NULL user_id hashes to a NULL arm whose
      |  -- per_arm row must not enter the pooled proportion (r12
      |  -- chaos-parity drive; no-op when every user_id is non-NULL)
      |  SELECT (
      |    (sum(CASE WHEN arm = 0 THEN n_converted END) / CAST(sum(CASE WHEN arm = 0 THEN n_users END) AS DOUBLE)
      |     - sum(CASE WHEN arm = 1 THEN n_converted END) / CAST(sum(CASE WHEN arm = 1 THEN n_users END) AS DOUBLE))
      |    / sqrt(sum(CASE WHEN arm IN (0, 1) THEN n_converted END) / CAST(sum(CASE WHEN arm IN (0, 1) THEN n_users END) AS DOUBLE)
      |        * (1 - sum(CASE WHEN arm IN (0, 1) THEN n_converted END) / CAST(sum(CASE WHEN arm IN (0, 1) THEN n_users END) AS DOUBLE))
      |        * (1.0 / sum(CASE WHEN arm = 0 THEN n_users END)
      |           + 1.0 / sum(CASE WHEN arm = 1 THEN n_users END)))) AS z
      |  FROM per_arm)
      |SELECT arm, CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_converted AS BIGINT) AS n_converted,
      |  round(n_converted / CAST(n_users AS DOUBLE), 4) AS conv_rate,
      |  round(total_revenue / n_users, 4) AS rev_per_user,
      |  round(z, 4) AS z_score
      |FROM per_arm CROSS JOIN zz
      |ORDER BY arm""".stripMargin

  /** Referential-integrity audit of the whole star schema: for each of
    * the seven FK edges, total child rows, NULL keys (not violations),
    * and orphans (non-NULL keys with no parent). Each edge is one
    * left join onto the DISTINCT parent-key set (dimension sides
    * broadcast; the lineitem→orders edge shuffles on the key) folded
    * into a single-row aggregate; the report unions seven scalar rows.
    * The synthetic generator is referentially clean — the gate
    * documents that, and the spec proves detection on planted orphans.
    */
  /** One FK edge of the audit: child rows joined to the distinct
    * parent-key set, folded to (total, null-keys, orphans). Public so
    * the spec can prove orphan DETECTION on planted violations (the
    * star schema itself is clean). */
  def fkEdge(name: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame = {
    val p = parent.select(col(pk).as("k")).distinct().withColumn("m", lit(1))
    child.select(col(ck).as("k")).join(p, Seq("k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_nulls"),
        sum(when(col("k").isNotNull && col("m").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(name).as("fk"), col("n_rows"), col("n_nulls"), col("n_orphans"))
  }

  private def dq04FkIntegrity(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame =
      fkEdge(name, child, ck, parent, pk)
    val li = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir); val su = Tables.supplier(s, dir)
    val pa = Tables.part(s, dir); val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .union(edge("lineitem.l_partkey->part", li, "l_partkey", pa, "p_partkey"))
      .union(edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"))
      .union(edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .union(edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .union(edge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
      .union(edge("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"))
      .withColumn("orphan_rate",
        round(col("n_orphans") / col("n_rows"), 4))
      .orderBy(col("fk"))
  }

  private val dq04Sql = {
    def edge(name: String, child: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS fk, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN c.$ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(sum(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p ON c.$ck = p.$pk""".stripMargin
    Seq(
      edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("SELECT fk, n_rows, n_nulls, n_orphans, round(n_orphans / CAST(n_rows AS DOUBLE), 4) AS orphan_rate FROM (\n",
        "\nUNION ALL ", "\n) ORDER BY fk")
  }

  /** IQR outlier fences for a grouped value column, computed
    * scale-safely: quartiles come from the per-group 2-dp value
    * histogram (rank-based, q = min value whose cumulative count
    * reaches ceil(q·n) — no interpolation, so integer logic decides),
    * and the outlier count is one broadcast-join-and-aggregate pass.
    * No global sort, no per-row window; the only windows run over the
    * bounded per-group histograms. Public so the spec can plant
    * outliers. */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // integer cents end-to-end: quartiles are exact cent values and the
    // 1.5·IQR fences live in HALF-cents, so no engine ever rounds a
    // half-way decimal (round(x, 2) at an exact .xx5 is where Spark's
    // HALF_UP-on-decimal and DuckDB's binary-value rounding part ways)
    // finite screen (r11): floor() on a double returns LONG, so a
    // single NaN/±Inf metric is an ANSI ARITHMETIC_OVERFLOW that
    // aborts the whole audit — exactly the failure an outlier AUDIT
    // must survive. Non-finite values are excluded from the histogram
    // (they would poison the quartiles in either direction); NULLs
    // keep their original path. Mirrored in the oracle (isfinite).
    val d = df.filter(col(valueCol).isNull ||
        (!isnan(col(valueCol)) && abs(col(valueCol)) < lit(Double.PositiveInfinity)))
      .select(col(groupCol).as("g"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("vc"))
      // materialized (r19 optimization round): `d` feeds the histogram
      // AND the final fence probe — two full input scans unstaged
      .localCheckpoint()
    val hist = d.groupBy(col("g"), col("vc")).agg(count(lit(1)).as("n"))
    val tot = hist.groupBy(col("g")).agg(sum(col("n")).as("nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialized: q1 and q3 are different filters over this bounded
    // cumulative histogram — unstaged, the window pass ran twice.
    // Console A/B for the pair of checkpoints: 1.20-1.84 s → 0.74-0.89 s
    // steady at sf0.1, byte-identical output.
    val cum = hist.withColumn("cum", sum(col("n")).over(w)).join(tot, "g")
      .localCheckpoint()
    val q1 = cum.filter(col("cum") >= ceil(col("nn") * 0.25))
      .groupBy(col("g")).agg(min(col("vc")).as("q1c"))
    val q3 = cum.filter(col("cum") >= ceil(col("nn") * 0.75))
      .groupBy(col("g")).agg(min(col("vc")).as("q3c"))
    val fences = tot.join(q1, "g").join(q3, "g")
      .select(col("g"), col("nn"), col("q1c"), col("q3c"),
        (lit(2) * col("q1c") - lit(3) * (col("q3c") - col("q1c"))).as("lo_hc"),
        (lit(2) * col("q3c") + lit(3) * (col("q3c") - col("q1c"))).as("hi_hc"))
    d.join(broadcast(fences), "g")
      .groupBy(col("g"))
      .agg(sum(when(lit(2) * col("vc") < col("lo_hc")
          || lit(2) * col("vc") > col("hi_hc"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .join(fences, "g")
      .select(col("g").as(groupCol), col("nn").as("n"),
        (col("q1c") / 100.0).as("q1"), (col("q3c") / 100.0).as("q3"),
        (col("lo_hc") / 200.0).as("lo_fence"), (col("hi_hc") / 200.0).as("hi_fence"),
        col("n_outliers"),
        round(col("n_outliers") / col("nn"), 4).as("outlier_rate"))
      .orderBy(col(groupCol))
  }

  private def dq05IqrOutliers(s: SparkSession, dir: String): DataFrame =
    iqrOutliers(Tables.events(s, dir), "event_type", "value")

  private val dq05Sql =
    """WITH d AS (
      |  SELECT event_type AS g,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events WHERE value IS NULL OR isfinite(value)),
      |hist AS (SELECT g, vc, count(*) AS n FROM d GROUP BY 1, 2),
      |tot AS (SELECT g, sum(n) AS nn FROM hist GROUP BY 1),
      |cum AS (
      |  SELECT h.g, h.vc, t.nn,
      |    sum(h.n) OVER (PARTITION BY h.g ORDER BY h.vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist h JOIN tot t USING (g)),
      |q1 AS (SELECT g, min(vc) AS q1c FROM cum WHERE cum >= ceil(nn * 0.25) GROUP BY 1),
      |q3 AS (SELECT g, min(vc) AS q3c FROM cum WHERE cum >= ceil(nn * 0.75) GROUP BY 1),
      |fences AS (
      |  SELECT t.g, t.nn, q1.q1c, q3.q3c,
      |    2 * q1.q1c - 3 * (q3.q3c - q1.q1c) AS lo_hc,
      |    2 * q3.q3c + 3 * (q3.q3c - q1.q1c) AS hi_hc
      |  FROM tot t JOIN q1 USING (g) JOIN q3 USING (g)),
      |oc AS (
      |  SELECT d.g,
      |    sum(CASE WHEN 2 * d.vc < f.lo_hc OR 2 * d.vc > f.hi_hc THEN 1 ELSE 0 END) AS n_outliers
      |  FROM d JOIN fences f USING (g) GROUP BY 1)
      |SELECT f.g AS event_type, CAST(f.nn AS BIGINT) AS n,
      |  f.q1c / 100.0 AS q1, f.q3c / 100.0 AS q3,
      |  f.lo_hc / 200.0 AS lo_fence, f.hi_hc / 200.0 AS hi_fence,
      |  CAST(oc.n_outliers AS BIGINT) AS n_outliers,
      |  round(oc.n_outliers / CAST(f.nn AS DOUBLE), 4) AS outlier_rate
      |FROM fences f JOIN oc USING (g)
      |ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q105_retention_cohorts", q105RetentionCohorts, Some(q105Sql)),
    Q("q106_event_funnel", q106EventFunnel, Some(q106Sql)),
    Q("q107_rolling_wau", q107RollingWau, Some(q107Sql)),
    Q("q108_ab_test", q108AbTest, Some(q108Sql)),
    Q("dq04_fk_integrity", dq04FkIntegrity, Some(dq04Sql)),
    Q("dq05_iqr_outliers", dq05IqrOutliers, Some(dq05Sql)))
}
