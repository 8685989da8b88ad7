package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 third wave: the revenue-side cohort curve that completes
  * q105's retention view, and the cross-table consistency audit that
  * completes the data-quality family's integrity pair (dq04 checks
  * keys, dq06 checks VALUES).
  */
object Extended22Queries {

  /** Cohort LTV curve: cumulative purchase revenue per cohort member
    * by week offset — q105's cohorts with money attached. The
    * cumulative window runs over the (cohort × offset) aggregate,
    * whose row count is bounded by calendar-weeks², never by users or
    * events; cohort sizes broadcast.
    */
  private def q109CohortLtv(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val first = p.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = first.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    val wkRev = p.join(first, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(date_trunc('week', ts), cohort_week) DIV 7 AS INT)")
          .as("week_offset"),
        col("value"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(sum(col("value")).as("wk_rev"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wkRev.withColumn("cum_rev", sum(col("wk_rev")).over(w))
      .join(broadcast(sizes), "cohort_week")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), round(col("wk_rev"), 2).as("wk_rev"),
        round(col("cum_rev"), 2).as("cum_rev"), col("cohort_size"),
        round(col("cum_rev") / col("cohort_size"), 2).as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val q109Sql =
    """WITH p AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
      |first AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM p GROUP BY 1),
      |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY 1),
      |wk AS (
      |  SELECT f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, date_trunc('week', p.ts)) // 7 AS INTEGER) AS week_offset,
      |    sum(p.value) AS wk_rev
      |  FROM p JOIN first f USING (user_id)
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_week, week_offset, wk_rev,
      |    sum(wk_rev) OVER (PARTITION BY cohort_week ORDER BY week_offset
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      |  FROM wk)
      |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week, c.week_offset,
      |  round(c.wk_rev, 2) AS wk_rev, round(c.cum_rev, 2) AS cum_rev,
      |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
      |  round(c.cum_rev / s.cohort_size, 2) AS ltv_per_user
      |FROM cum c JOIN sizes s USING (cohort_week)
      |ORDER BY cohort_week, c.week_offset""".stripMargin

  /** Cross-table value reconciliation: does o_totalprice equal the
    * order's lineitem total Σ extprice·(1−disc)·(1+tax)? Per order
    * status: order count, orders with NO lineitems at all, mismatches
    * beyond a cent, and the mean/max absolute delta. One shuffle on
    * the order key, one status rollup. The synthetic generator draws
    * o_totalprice independently of its lineitems, so the audit
    * reports 100% mismatch — documented honestly (dq03's posture);
    * on real warehouse data the same query is the booking-integrity
    * screen. Spec proves the zero-delta path on constructed data.
    */
  /** Public so the spec can prove the zero-delta path on constructed
    * books that DO reconcile. */
  def priceReconciliation(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val li = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax"))).as("computed"))
    orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"),
        col("computed").isNull.as("no_lines"),
        when(col("computed").isNull, lit(0.0))
          .otherwise(abs(col("o_totalprice") - col("computed"))).as("ad"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("no_lines"), 1L).otherwise(0L)).as("n_no_lines"),
        sum(when(!col("no_lines") && col("ad") > 0.01, 1L).otherwise(0L)).as("n_mismatched"),
        round(avg(when(!col("no_lines"), col("ad"))), 2).as("avg_abs_delta"),
        round(max(when(!col("no_lines"), col("ad"))), 2).as("max_abs_delta"))
      .orderBy(col("o_orderstatus"))
  }

  private def dq06PriceReconciliation(s: SparkSession, dir: String): DataFrame =
    priceReconciliation(Tables.orders(s, dir), Tables.lineitem(s, dir))

  private val dq06Sql =
    """WITH c AS (
      |  SELECT l_orderkey,
      |    sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS computed
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderstatus, (c.computed IS NULL) AS no_lines,
      |    CASE WHEN c.computed IS NULL THEN 0.0
      |         ELSE abs(o.o_totalprice - c.computed) END AS ad
      |  FROM orders o LEFT JOIN c ON o.o_orderkey = c.l_orderkey)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
      |  CAST(sum(CASE WHEN NOT no_lines AND ad > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
      |  round(avg(CASE WHEN NOT no_lines THEN ad END), 2) AS avg_abs_delta,
      |  round(max(CASE WHEN NOT no_lines THEN ad END), 2) AS max_abs_delta
      |FROM j GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q109_cohort_ltv", q109CohortLtv, Some(q109Sql)),
    Q("dq06_price_reconciliation", dq06PriceReconciliation, Some(dq06Sql)))
}
