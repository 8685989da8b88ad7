package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.AsOf

/** Join shapes beyond equi-joins: as-of (composed from built-ins,
  * checked against DuckDB's native ASOF JOIN) and range/theta joins.
  */
object JoinQueries {

  /** For each purchase event, the value of the user's latest click at
    * or before the purchase time. Right side pre-aggregated to unique
    * (user, ts) so tie-breaking is engine-independent.
    */
  private def q36Asof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOf.asofJoinLatest(purchases, clicks, "user_id", "ts", "click_value")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("click_value"))
      .orderBy(col("event_id"))
  }

  private val q36Sql =
    """WITH clicks AS (
      |  SELECT user_id, ts, round(max(value), 2) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      |), purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  c.click_value
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Range (theta) join: classify each order's totalprice into literal
    * price bands via a BETWEEN join — a broadcast nested-loop on a
    * tiny literal dimension, the right plan for band lookup at any
    * scale.
    */
  private def q37RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("budget", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("premium", 150000.0, 500000.0),
      ("luxury", 500000.0, 1e12),
    ).toDF("band", "lo", "hi")
    Tables.orders(s, dir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy(col("band"))
  }

  private val q37Sql =
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('budget', 0.0, 50000.0),
      |  ('mid', 50000.0, 150000.0),
      |  ('premium', 150000.0, 500000.0),
      |  ('luxury', 500000.0, 1e12))
      |SELECT band, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
      |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band
      |ORDER BY band""".stripMargin

  /** Identical as-of semantics through the custom whole-operator path
    * (graft.plans.AsofJoin → AsofMergeJoinExec, preference tier (c)) —
    * gated against the SAME DuckDB ASOF JOIN oracle as q36, proving
    * the custom physical operator end-to-end.
    */
  private def q36bAsofExec(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOf.asofJoinLatestExec(purchases, clicks, "user_id", "ts", "click_value")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("click_value"))
      .orderBy(col("event_id"))
  }

  /** Tolerance-bounded as-of: same probe, but clicks more than 30
    * minutes stale are not carried (pandas merge_asof tolerance
    * shape). DuckDB's native ASOF can't add the staleness bound, so
    * the oracle derives it from a windowed latest-match.
    */
  private def q36cAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOf.asofJoinLatestWithin(purchases, clicks, "user_id", "ts", "click_value",
        toleranceMicros = 30L * 60 * 1000000)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("click_value"))
      .orderBy(col("event_id"))
  }

  private val q36cSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, round(max(value), 2) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      |), purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |), latest AS (
      |  SELECT event_id, click_value, cts FROM (
      |    SELECT p.event_id, c.click_value, c.ts AS cts,
      |      row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC) AS rn
      |    FROM purchases p JOIN clicks c
      |      ON p.user_id = c.user_id AND c.ts <= p.ts)
      |  WHERE rn = 1
      |)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  CASE WHEN epoch_us(p.ts) - epoch_us(l.cts) <= 1800000000
      |       THEN l.click_value END AS click_value
      |FROM purchases p LEFT JOIN latest l USING (event_id)
      |ORDER BY p.event_id""".stripMargin

  /** Forward as-of: each purchase joined to the user's NEXT click at
    * or after the purchase — checked against DuckDB's native ASOF with
    * the inequality flipped.
    */
  private def q36dAsofNext(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOf.asofJoinNext(purchases, clicks, "user_id", "ts", "click_value")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("click_value"))
      .orderBy(col("event_id"))
  }

  private val q36dSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, round(max(value), 2) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      |), purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  c.click_value
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.ts
      |ORDER BY p.event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q36_asof_join", q36Asof, Some(q36Sql)),
    Q("q36b_asof_exec", q36bAsofExec, Some(q36Sql)),
    Q("q36c_asof_tolerance", q36cAsofTolerance, Some(q36cSql)),
    Q("q36d_asof_next", q36dAsofNext, Some(q36dSql)),
    Q("q37_range_join", q37RangeJoin, Some(q37Sql)),
  )
}
