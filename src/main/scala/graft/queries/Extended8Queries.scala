package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextStats

/** Round-7 fourth wave: the remaining production-pipeline shapes a
  * 100 TB curation/feature stack runs daily — content-defined chunking
  * (storage-level dedup), EWMA smoothing and linear-interpolation
  * imputation (time-series features), a single-pass data-quality
  * constraint audit (the Deequ shape), and a decile lift/gains table
  * (model evaluation without a global sort).
  */
object Extended8Queries {

  // ---------------------------------------------------------------- tx20

  /** Content-defined chunking (the rsync/LBFS/gear-hash family):
    * chunk boundaries fall where md5Hash48(token) ≡ 0 (mod 8), so an
    * insertion early in a document shifts ONE chunk, not every
    * fixed-width window — which is why CDC dedupes where fixed spans
    * can't. Per-source report: chunks, distinct chunk fingerprints,
    * dup ratio, mean chunk width.
    *
    * Scale shape: the only window is per-document over token positions
    * (bounded by doc length); chunk identity is a 48-bit fingerprint
    * groupBy. Nothing global, nothing pairwise.
    */
  private def tx20CdcChunks(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        posexplode(TextStats.tokens(col("text"))).as(Seq("pos", "tok")))
    val flagged = toks.withColumn("boundary",
      when(col("pos") === 0 ||
        graft.dedup.Dedup.md5Hash48(col("tok")) % 8 === 0, 1).otherwise(0))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val chunks = flagged
      .withColumn("chunk", sum(col("boundary")).over(wd))
      .groupBy(col("doc_id"), col("source"), col("chunk"))
      .agg(count(lit(1)).as("width"),
        graft.dedup.Dedup.md5Hash48(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")))).as("fp"))
    chunks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("fp")).as("n_distinct"),
        round(lit(1.0) - countDistinct(col("fp")) / count(lit(1)).cast("double"), 4)
          .as("dup_ratio"),
        round(avg(col("width")), 2).as("avg_width"))
      .orderBy(col("source"))
  }

  private val tx20Sql =
    """WITH toks AS (
      |  SELECT doc_id, source, pos - 1 AS pos, t[pos] AS tok
      |  FROM (
      |    SELECT doc_id, source, t, unnest(range(1, len(t) + 1)) AS pos
      |    FROM (
      |      SELECT doc_id, source,
      |        list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'), z -> z != '') AS t
      |      FROM documents) d0) d1),
      |flagged AS (
      |  SELECT doc_id, source, pos, tok,
      |    CASE WHEN pos = 0
      |      OR ('0x' || substr(md5(tok), 1, 12))::BIGINT % 8 = 0
      |      THEN 1 ELSE 0 END AS boundary
      |  FROM toks),
      |chunked AS (
      |  SELECT doc_id, source, tok, pos,
      |    sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
      |  FROM flagged),
      |chunks AS (
      |  SELECT doc_id, source, chunk, count(*) AS width,
      |    ('0x' || substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 12))::BIGINT AS fp
      |  FROM chunked GROUP BY 1, 2, 3)
      |SELECT source, count(*) AS n_chunks,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
      |  round(1.0 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE), 4) AS dup_ratio,
      |  round(avg(width), 2) AS avg_width
      |FROM chunks GROUP BY 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q92

  /** EWMA smoothing of each user's hourly event counts (α=0.3), the
    * standard anomaly-baseline / trend feature. Formulated WITHOUT
    * recursion: a 20-row band self-join on the per-user row number
    * (weights α(1−α)^Δ truncated at Δ=20, where (0.7)^20 < 8e-4 of the
    * mass) — both engines sum the identical 20 products, so no
    * iterated float state exists at all.
    *
    * Scale shape: the band join fans each row out ≤ 20× on the
    * (user, rn) equi-key — linear in the data, partitioned by user; no
    * global window, no recursion, no driver state.
    */
  private def q92Ewma(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir).filter(col("user_id") < 30)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy(col("user_id")).orderBy(col("h"))
    val rn = counts.withColumn("rn", row_number().over(wr)).localCheckpoint()
    val pairs = rn.as("a").join(rn.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("b.rn").between(col("a.rn") - 19, col("a.rn")))
    pairs
      .groupBy(col("a.user_id").as("user_id"), col("a.h").as("h"),
        col("a.n").as("n"))
      .agg((sum(pow(lit(0.7), col("a.rn") - col("b.rn")) * col("b.n")) /
        sum(pow(lit(0.7), col("a.rn") - col("b.rn")))).as("ewma_raw"))
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"), col("n"),
        round(col("ewma_raw"), 6).as("ewma"))
      .orderBy(col("user_id"), col("hour"))
  }

  private val q92Sql =
    """WITH counts AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
      |  FROM events WHERE user_id < 30 GROUP BY 1, 2),
      |rn AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY h) AS rn
      |  FROM counts)
      |SELECT a.user_id, strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour, a.n,
      |  round(sum(pow(0.7, a.rn - b.rn) * b.n) / sum(pow(0.7, a.rn - b.rn)), 6)
      |    AS ewma
      |FROM rn a JOIN rn b
      |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
      |GROUP BY 1, a.h, a.n
      |ORDER BY a.user_id, hour""".stripMargin

  // ---------------------------------------------------------------- q93

  /** Linear-interpolation imputation over each user's dense hourly
    * grid: gaps between observations take the time-weighted blend of
    * the neighboring observed values; edges clamp to the nearest
    * observation. The last(ignoreNulls)/first(ignoreNulls) window pair
    * is the standard distributed formulation — state is one value per
    * row, partitioned per user, never global.
    */
  private def q93Interp(s: SparkSession, dir: String): DataFrame = {
    // Non-finite readings fold to inert NULL BEFORE the hourly avg
    // (r12 chaos-parity drive): one NaN sensor value otherwise makes
    // the hour's avg NaN, the cumulative fills smear it across the
    // user's whole spine, and Spark's floor(NaN).toLong lands the
    // entire series on 0.0 while DuckDB keeps NaN — silent corruption
    // on one engine, poison on the other. NULL keeps the HOUR on the
    // spine (interpolated like any unobserved hour), losing only the
    // poisoned reading. x * 0 is NaN exactly for NaN/±Inf.
    val obs = Tables.events(s, dir).filter(col("user_id") < 20)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(avg(when(isnan(col("value") * lit(0.0)),
        lit(null).cast("double")).otherwise(col("value"))), 4).as("v"))
    // spine clamp (Guards.SpineCapHours): before the clamp, one
    // corrupted timestamp pair (year 0001 + 9999, r11 chaos shard)
    // generated an ~87M-row hourly spine for a single user — mirrored
    // in the oracle
    val spans = obs.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"),
        least(max(col("h")),
          min(col("h")) + expr(s"INTERVAL ${Guards.SpineCapHours} HOURS")).as("h1"))
    val dense = spans.select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      .join(obs, Seq("user_id", "h"), "left")
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // next-value via a REVERSED cumulative frame, not (0, unboundedFollowing):
    // Spark's UnboundedPreceding frame is computed incrementally (O(n)
    // per partition) while UnboundedFollowing re-scans to the partition
    // end per row — O(n²), and over a spilled buffer that re-read
    // spill files per row (the r11 chaos hang: 20+ CPU-minutes on one
    // task). first_non_null at-or-after h on ascending order IS
    // last_non_null at-or-before h on descending order — identical
    // semantics, linear cost at any partition size.
    val wNextRev = Window.partitionBy(col("user_id")).orderBy(col("h").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = dense
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(col("v").isNotNull, col("h")), ignoreNulls = true)
        .over(wPrev))
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNextRev))
      .withColumn("nh", last(when(col("v").isNotNull, col("h")), ignoreNulls = true)
        .over(wNextRev))
    // interpolation between 4-dp neighbors systematically lands on
    // exact .xxxx5 decimals (ratio 1/2 of a 4-dp delta), where Spark's
    // BigDecimal round (via Double.toString's shortest repr) and
    // DuckDB's numeric round pick DIFFERENT sides. floor(x*1e4 + 0.5)
    // rounds the identical binary double identically in both engines —
    // no decimal re-interpretation anywhere.
    val interp = when(col("v").isNotNull, col("v"))
      .when(col("pv").isNull, col("nv"))
      .when(col("nv").isNull, col("pv"))
      .otherwise(col("pv") + (col("nv") - col("pv")) *
        (unix_timestamp(col("h")) - unix_timestamp(col("ph"))) /
        (unix_timestamp(col("nh")) - unix_timestamp(col("ph"))))
    filled.select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        (floor(interp * 10000 + 0.5) / 10000.0).as("v_filled"),
        col("v").isNotNull.as("observed"))
      .orderBy(col("user_id"), col("hour"))
  }

  private val q93Sql =
    s"""WITH obs AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    round(avg(CASE WHEN isnan(value * 0) THEN NULL ELSE value END), 4) AS v
      |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
      |spans AS (SELECT user_id, min(h) AS h0,
      |            least(max(h), min(h) + INTERVAL ${Guards.SpineCapHours} HOURS) AS h1
      |          FROM obs GROUP BY 1),
      |dense AS (
      |  SELECT s.user_id, unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS h
      |  FROM spans s),
      |joined AS (
      |  SELECT d.user_id, d.h, o.v FROM dense d
      |  LEFT JOIN obs o ON o.user_id = d.user_id AND o.h = d.h),
      |filled AS (
      |  SELECT user_id, h, v,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
      |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      |  FROM joined)
      |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  floor((CASE
      |    WHEN v IS NOT NULL THEN v
      |    WHEN pv IS NULL THEN nv
      |    WHEN nv IS NULL THEN pv
      |    ELSE pv + (nv - pv) * (epoch(h) - epoch(ph)) / (epoch(nh) - epoch(ph))
      |  END) * 10000 + 0.5) / 10000.0 AS v_filled,
      |  v IS NOT NULL AS observed
      |FROM filled
      |ORDER BY user_id, hour""".stripMargin

  // ---------------------------------------------------------------- dq01

  /** Single-pass data-quality constraint audit (the Deequ/
    * Great-Expectations shape): PK uniqueness, FK containment, range,
    * domain, and completeness checks, each reduced to a violation
    * count — per table ONE aggregate scan (the FK check is one
    * broadcast-ably small anti-join), unioned into a tiny report.
    * This is the gate a 100 TB ingest runs before anything else reads
    * the drop.
    */
  private def dq01Constraints(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val c = Tables.customer(s, dir)
    val pkDup = o.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
      .as("n_violations"))
      .select(lit("orders_pk_unique").as("check"), col("n_violations"))
    val fkOrphan = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem_fk_orders").as("check"), col("n_violations"))
    val discRange = li.agg(sum(when(col("l_discount") < 0 ||
        col("l_discount") > 0.1, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("lineitem_discount_range").as("check"), col("n_violations"))
    val flagDomain = li.agg(sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
        .otherwise(0L)).as("n_violations"))
      .select(lit("lineitem_returnflag_domain").as("check"), col("n_violations"))
    val balComplete = c.agg(sum(when(col("c_acctbal").isNull, 1L).otherwise(0L))
      .as("n_violations"))
      .select(lit("customer_acctbal_complete").as("check"), col("n_violations"))
    val dateBounds = o.agg(sum(when(col("o_orderdate") < to_date(lit("1995-01-01")) ||
        col("o_orderdate") > to_date(lit("2001-12-31")), 1L).otherwise(0L))
      .as("n_violations"))
      .select(lit("orders_date_bounds").as("check"), col("n_violations"))
    pkDup.union(fkOrphan).union(discRange).union(flagDomain)
      .union(balComplete).union(dateBounds)
      .select(col("check"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
      .orderBy(col("check"))
  }

  private val dq01Sql =
    """WITH checks AS (
      |  SELECT 'orders_pk_unique' AS "check",
      |    count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders',
      |    count(*) FROM lineitem l
      |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_discount_range',
      |    coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END), 0)
      |    FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_returnflag_domain',
      |    coalesce(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END), 0)
      |    FROM lineitem
      |  UNION ALL
      |  SELECT 'customer_acctbal_complete',
      |    coalesce(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END), 0)
      |    FROM customer
      |  UNION ALL
      |  SELECT 'orders_date_bounds',
      |    coalesce(sum(CASE WHEN o_orderdate < DATE '1995-01-01'
      |      OR o_orderdate > DATE '2001-12-31' THEN 1 ELSE 0 END), 0)
      |    FROM orders)
      |SELECT "check", CAST(n_violations AS BIGINT) AS n_violations,
      |  n_violations = 0 AS pass
      |FROM checks ORDER BY "check"""".stripMargin

  // ---------------------------------------------------------------- q94

  /** Decile lift / gains table — the model-evaluation report every
    * scored population gets, computed WITHOUT a global score sort:
    * deciles come from the value-histogram CDF (floor(price/1000)
    * buckets — domain-bounded), exactly the q45b/tx17 technique.
    * Response = order status 'F'; decile 1 = highest scores.
    * cum_capture is the gains curve: fraction of all responders
    * captured at or above each decile.
    */
  private def q94DecileLift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      floor(col("o_totalprice") / 1000).cast("long").as("b"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val hist = o.groupBy(col("b"))
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("yb"))
    val wc = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = o.agg(count(lit(1)).as("n"), sum(col("y")).as("ny"))
    val cum = hist.withColumn("cum", sum(col("nb")).over(wc))
    val dec = cum.crossJoin(broadcast(tot))
      .select(col("b"), col("nb"), col("yb"), col("n"), col("ny"),
        least(ceil(col("cum") * 10 / col("n")), lit(10)).cast("long").as("decile"))
      .groupBy(col("decile"))
      .agg(sum(col("nb")).as("n_orders"), sum(col("yb")).as("n_resp"),
        min(col("n")).as("n"), min(col("ny")).as("ny"))
    val wd = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dec
      .withColumn("cum_resp", sum(col("n_resp")).over(wd))
      .select(col("decile"), col("n_orders"), col("n_resp"),
        round(col("n_resp") / col("n_orders").cast("double"), 4).as("resp_rate"),
        round((col("n_resp") / col("n_orders").cast("double")) /
          (col("ny") / col("n").cast("double")), 4).as("lift"),
        round(col("cum_resp") / col("ny").cast("double"), 4).as("cum_capture"))
      .orderBy(col("decile"))
  }

  private val q94Sql =
    """WITH o AS (
      |  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS b,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |hist AS (SELECT b, count(*) AS nb, sum(y) AS yb FROM o GROUP BY 1),
      |tot AS (SELECT count(*) AS n, sum(y) AS ny FROM o),
      |cum AS (
      |  SELECT b, nb, yb,
      |    sum(nb) OVER (ORDER BY b DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |dec AS (
      |  SELECT least(CAST(ceil(c.cum * 10 / CAST(t.n AS DOUBLE)) AS BIGINT), 10)
      |      AS decile,
      |    sum(c.nb) AS n_orders, sum(c.yb) AS n_resp, min(t.n) AS n, min(t.ny) AS ny
      |  FROM cum c CROSS JOIN tot t
      |  GROUP BY 1)
      |SELECT decile, CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(n_resp AS BIGINT) AS n_resp,
      |  round(n_resp / CAST(n_orders AS DOUBLE), 4) AS resp_rate,
      |  round((n_resp / CAST(n_orders AS DOUBLE))
      |    / (ny / CAST(n AS DOUBLE)), 4) AS lift,
      |  round(sum(n_resp) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    / CAST(min(ny) OVER () AS DOUBLE), 4) AS cum_capture
      |FROM dec
      |ORDER BY decile""".stripMargin

  val all: Seq[Q] = Seq(
    Q("tx20_cdc_chunks", tx20CdcChunks, Some(tx20Sql)),
    Q("q92_ewma", q92Ewma, Some(q92Sql)),
    Q("q93_interp", q93Interp, Some(q93Sql)),
    Q("dq01_constraints", dq01Constraints, Some(dq01Sql)),
    Q("q94_decile_lift", q94DecileLift, Some(q94Sql)),
  )
}
