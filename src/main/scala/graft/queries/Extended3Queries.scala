package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening: deterministic reproducible sampling and the
  * classic multi-way star join (TPC-H Q5 shape) as a join-planning
  * showcase. All oracle-checked against DuckDB.
  */
object Extended3Queries {

  /** Deterministic hash-based sampling — the reproducible alternative
    * to `sample(fraction)` for 100 TB pipelines: membership depends
    * only on the key (md5 bucket), so the same ~10% of orders is
    * selected on every engine, every run, and any partitioning — and
    * downstream joins on the sampled key can co-sample other tables
    * with the same predicate (correlated sampling). A plain codegen'd
    * projection + filter; pushes down to the scan as a row-group
    * filter residual.
    */
  private def q58HashSample(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bucket",
        pmod(graft.dedup.Dedup.md5Hash48(col("o_orderkey").cast("string")), lit(100)))
      .filter(col("bucket") < 10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("bucket").cast("int").as("bucket"))
      .orderBy(col("o_orderkey"))

  private val q58Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT % 100 AS INTEGER) AS bucket
      |FROM orders
      |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT % 100 < 10
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q5 shape: revenue per nation for one region and a two-year
    * order window, over the full 6-table join
    * lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region with
    * the Q5 co-location constraint s_nationkey = c_nationkey.
    *
    * Join-planning posture for 100 TB: region/nation/supplier are
    * broadcast (dims), so the only shuffles are the two fact joins
    * (lineitem ⋈ orders on orderkey, then ⋈ customer on custkey) —
    * both AQE-sized; the o_orderdate filter lands on the orders scan
    * before its shuffle, and column pruning reaches every scan.
    */
  private def q59TpchQ5(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey")
          && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  private val q59Sql =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Time-grid gap-fill: regularize an event series onto a dense
    * hourly grid per event type (missing hours become explicit
    * zero rows) — the resampling step every time-series feature
    * pipeline needs before windowed models. The grid is generated
    * distributed (sequence + explode per group, one row per group
    * before the explode), never on the driver.
    */
  private def q60GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
    val counts = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    // spine clamp (Guards.SpineCapHours): one corrupted max-timestamp
    // must not explode the generated grid — mirrored in the oracle
    val grid = ev.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"),
        least(max(col("h")),
          min(col("h")) + expr(s"INTERVAL ${Guards.SpineCapHours} HOURS")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy(col("event_type"), col("hour"))
  }

  private val q60Sql =
    s"""WITH ev AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, value FROM events
      |), counts AS (
      |  SELECT event_type, h, count(*) AS n, round(sum(value), 2) AS total_value
      |  FROM ev GROUP BY 1, 2
      |), grid AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT event_type, min(h) AS h0,
      |          least(max(h), min(h) + INTERVAL ${Guards.SpineCapHours} HOURS) AS h1
      |        FROM ev GROUP BY 1)
      |)
      |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  CAST(coalesce(n, 0) AS BIGINT) AS n,
      |  coalesce(total_value, 0.0) AS total_value
      |FROM grid g LEFT JOIN counts c ON g.event_type = c.event_type AND g.h = c.h
      |ORDER BY g.event_type, hour""".stripMargin

  /** Re-aggregatable distinct-count sketches (Apache DataSketches HLL
    * via Spark's hll_sketch_agg/hll_union_agg): daily per-type user
    * sketches merged into an all-time estimate next to the exact
    * count. THE pattern for 100 TB distinct-counting — daily sketches
    * are tiny, mergeable across any date range without rescanning, and
    * the union is associative so partial aggregation applies. No
    * DuckDB analogue → rows-only gate; estimate-vs-exact error is
    * asserted in a spec.
    */
  private def q61HllSketch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
        sum(col("n")).as("n_events"))
      .orderBy(col("event_type"))

  /** q61's hash-green twin: EXACT distinct counting via mergeable
    * bitmaps — the production alternative to HLL when the key domain
    * is modest (user ids here). Per (type, 32-bit word) bitmaps are
    * one map-side-combined bit_or aggregate; the '_all' row is
    * derived from the SKETCHES ALONE (bit_or across types per word,
    * popcount) with no second data scan — the same
    * shard→sketch→merge shape q61 demonstrates with HLL, but
    * bit-for-bit reproducible in any engine. At 100 TB the bitmap is
    * |domain|/8 bytes per group — exact where HLL would approximate,
    * and the same partial-aggregation friendliness.
    */
  private def q61bBitmapDistinct(s: SparkSession, dir: String): DataFrame = {
    val bits = Tables.events(s, dir)
      .select(col("event_type"), expr("user_id DIV 32").as("w"),
        expr("shiftleft(1L, CAST(user_id % 32 AS INT))").as("bit"))
      .groupBy(col("event_type"), col("w"))
      .agg(expr("bit_or(bit)").as("bm"))
      .localCheckpoint() // tiny (types × words); feeds counts AND merge
    val perType = bits.groupBy(col("event_type"))
      .agg(sum(expr("bit_count(bm)")).as("n_users"))
    val merged = bits.groupBy(col("w")).agg(expr("bit_or(bm)").as("u"))
      .agg(sum(expr("bit_count(u)")).as("n_users"))
      .select(lit("_all").as("event_type"), col("n_users"))
    perType.union(merged).orderBy(col("event_type"))
  }

  private val q61bSql =
    """WITH bits AS (
      |  SELECT event_type, user_id // 32 AS w,
      |    bit_or(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS bm
      |  FROM events GROUP BY 1, 2),
      |per_type AS (
      |  SELECT event_type, CAST(sum(bit_count(bm)) AS BIGINT) AS n_users
      |  FROM bits GROUP BY 1),
      |merged AS (
      |  SELECT '_all' AS event_type, CAST(sum(bit_count(u)) AS BIGINT) AS n_users
      |  FROM (SELECT w, bit_or(bm) AS u FROM bits GROUP BY 1))
      |SELECT event_type, n_users FROM per_type
      |UNION ALL SELECT event_type, n_users FROM merged
      |ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q58_hash_sample", q58HashSample, Some(q58Sql)),
    Q("q59_tpch_q5", q59TpchQ5, Some(q59Sql)),
    Q("q60_gapfill", q60GapFill, Some(q60Sql)),
    Q("q61_hll_sketch", q61HllSketch, None),
    Q("q61b_bitmap_distinct", q61bBitmapDistinct, Some(q61bSql)),
  )
}
