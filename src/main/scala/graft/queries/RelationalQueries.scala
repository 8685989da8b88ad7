package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.2–§2.7) recast onto the
  * testdata star schema per FIXTURES.md §3. Each query name cites the
  * reference operator(s) it reproduces (reference file:line in the
  * scaladoc of each def).
  *
  * Scale posture: all queries are single-pass declarative plans —
  * filters/projections sit directly on the parquet scan (pushdown +
  * pruning), aggregations are partial+final hash aggs, joins either
  * broadcast (dim tables) or shuffle on the join key. Nothing collects
  * to the driver.
  */
object RelationalQueries {

  /** A2/A3/A5-style grouped aggregation with conditional arithmetic —
    * reference scripts/data_processing.py:147-154 (multi-agg) and
    * scripts/data_analysis.py:111-114 (trends agg). TPC-H Q1 shape.
    */
  private def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-06-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** P3/P4 conjunctive filter (isNotNull ∧ between ∧ isin) —
    * reference scripts/data_processing.py:99-106,112.
    */
  private def q02FilterConj(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_quantity") > 10 &&
          col("l_discount").between(0.02, 0.08) &&
          col("l_returnflag").isin("A", "R") &&
          col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_quantity > 10 AND l_discount BETWEEN 0.02 AND 0.08
      |  AND l_returnflag IN ('A','R') AND l_shipdate IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** P7 chained-when CASE bucketing —
    * reference scripts/data_processing.py:158-164 (runtimeMinutesBucket).
    */
  private def q03Bucket(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, 0)
          .when(col("l_quantity") <= 25, 1)
          .when(col("l_quantity") <= 40, 2)
          .otherwise(3).as("qty_bucket"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q03Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_quantity < 10 THEN 0
      |       WHEN l_quantity <= 25 THEN 1
      |       WHEN l_quantity <= 40 THEN 2
      |       ELSE 3 END AS qty_bucket
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** J1 inner equi-join + downstream agg —
    * reference scripts/data_processing.py:118, scripts/data_analysis.py:83.
    */
  private def q04JoinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("c_mktsegment"))

  private val q04Sql =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** J2 broadcast join chain over the dimension tables —
    * reference scripts/data_processing.py:119 (broadcast hint). Here the
    * broadcast is *justified*: nation (25 rows) and region (5 rows) stay
    * tiny at any scale factor, so the join is shuffle-free.
    */
  private def q05JoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
      .orderBy(col("r_name"))

  private val q05Sql =
    """SELECT r_name, count(*) AS n_customers,
      |  round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** J3/J4/J6 left join of an aggregation result back onto the base —
    * reference scripts/data_processing.py:144,156,247-248.
    */
  private def q06JoinLeftAgg(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("tot"))
    Tables.customer(s, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("tot"), lit(0.0)).as("total_price"))
      .orderBy(col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_custkey,
      |  coalesce(cnt, 0) AS n_orders,
      |  coalesce(tot, 0.0) AS total_price
      |FROM customer
      |LEFT JOIN (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
      |    round(sum(o_totalprice), 2) AS tot
      |  FROM orders GROUP BY o_custkey
      |) ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** O1 multi-key desc sort + limit = top-K (TakeOrderedAndProject) —
    * reference scripts/data_processing.py:284-286. Tie order pinned with
    * a unique tertiary key (SURVEY.md §7.4 item 2).
    */
  private def q07TopK(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("avg_price").desc, col("cnt").desc, col("l_partkey"))
      .limit(100)

  private val q07Sql =
    """SELECT l_partkey, round(avg(l_extendedprice), 4) AS avg_price,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_partkey
      |ORDER BY avg_price DESC, cnt DESC, l_partkey
      |LIMIT 100""".stripMargin

  /** F1/F2/D1 split → explode → distinct —
    * reference scripts/data_processing.py:122-127 (distinct genres).
    */
  private def q08ExplodeDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("token"))
      .distinct()
      .orderBy(col("token"))

  private val q08Sql =
    """SELECT DISTINCT token FROM (
      |  SELECT unnest(string_split(p_name, ' ')) AS token FROM part
      |) ORDER BY token""".stripMargin

  /** F3/F4 array_contains + size over split arrays —
    * reference scripts/data_processing.py:133 (one-hot membership),
    * :218-219 (size of knownForTitles).
    */
  private def q09ArrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        size(split(col("p_name"), " ")).as("n_name_tokens"),
        array_contains(split(col("p_name"), " "), "red").cast("int").as("is_red"))
      .orderBy(col("p_partkey"))

  private val q09Sql =
    """SELECT p_partkey,
      |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_name_tokens,
      |  CAST(list_contains(string_split(p_name, ' '), 'red') AS INTEGER) AS is_red
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** P5/P6 rlike regex filter (alternation, as in the popularity flags) —
    * reference scripts/data_processing.py:290-298, scripts/data_analysis.py:102-105.
    */
  private def q10Rlike(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_brand").rlike("^Brand#(1[0-5]|2)$"))
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))

  private val q10Sql =
    """SELECT p_partkey, p_brand FROM part
      |WHERE regexp_matches(p_brand, '^Brand#(1[0-5]|2)$')
      |ORDER BY p_partkey""".stripMargin

  /** P8/P9 one-hot encoding via equality + cast —
    * reference scripts/data_processing.py:131-137.
    */
  private def q11OneHot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("int").as("status_f"),
        (col("o_orderstatus") === "O").cast("int").as("status_o"),
        (col("o_orderstatus") === "P").cast("int").as("status_p"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("prio_urgent"))
      .orderBy(col("o_orderkey"))

  private val q11Sql =
    """SELECT o_orderkey,
      |  CAST(o_orderstatus = 'F' AS INTEGER) AS status_f,
      |  CAST(o_orderstatus = 'O' AS INTEGER) AS status_o,
      |  CAST(o_orderstatus = 'P' AS INTEGER) AS status_p,
      |  CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS prio_urgent
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** A6 null-profile single-row aggregation —
    * reference scripts/data_analysis.py:39.
    */
  private def q12NullProfile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(
      count(lit(1)).as("n_rows"),
      count(when(col("event_type").isNull, lit(1))).as("null_event_type"),
      count(when(col("props").isNull, lit(1))).as("null_props"),
      count(when(col("value").isNull || isnan(col("value")), lit(1))).as("null_value"))
  }

  private val q12Sql =
    """SELECT count(*) AS n_rows,
      |  CAST(count(CASE WHEN event_type IS NULL THEN 1 END) AS BIGINT) AS null_event_type,
      |  CAST(count(CASE WHEN props IS NULL THEN 1 END) AS BIGINT) AS null_props,
      |  CAST(count(CASE WHEN value IS NULL OR isnan(value) THEN 1 END) AS BIGINT) AS null_value
      |FROM events""".stripMargin

  /** The flagship trends query (SURVEY.md §3.2 / §7.2): scan + filter +
    * two joins + explode(split) + year extraction + grouped mean/sum +
    * sort. Genre×year ↦ p_name-token×order-year.
    * Reference scripts/data_analysis.py:44-116.
    */
  def q13Trends(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(explode(split(col("p_name"), " ")).as("token"),
        year(col("o_orderdate")).as("yr"), col("l_quantity"))
      .filter(col("yr") >= 1996)
      .groupBy(col("token"), col("yr"))
      .agg(round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("token"), col("yr"))

  private val q13Sql =
    """SELECT token, yr,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM (
      |  SELECT unnest(string_split(p_name, ' ')) AS token,
      |    CAST(year(o_orderdate) AS INTEGER) AS yr, l_quantity
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |)
      |WHERE yr >= 1996
      |GROUP BY token, yr
      |ORDER BY token, yr""".stripMargin

  /** A2 count-distinct + conditional sums inside one hash agg —
    * reference scripts/data_processing.py:147-154.
    */
  private def q14CondAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"))
      .orderBy(col("o_custkey"))

  private val q14Sql =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** A3 mean/min/max stats per group —
    * reference scripts/data_processing.py:227-244.
    */
  private def q15GroupStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(avg(col("l_quantity")), 4).as("mean_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(avg(col("l_discount")), 4).as("mean_disc"),
        min(col("l_discount")).as("min_disc"),
        max(col("l_discount")).as("max_disc"))
      .orderBy(col("l_returnflag"))

  private val q15Sql =
    """SELECT l_returnflag,
      |  round(avg(l_quantity), 4) AS mean_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  round(avg(l_discount), 4) AS mean_disc,
      |  min(l_discount) AS min_disc, max(l_discount) AS max_disc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** P14 threshold label engineering (rating<6 → 0 else 1) as pure
    * `when`, no UDF — reference scripts/model_train_explain.py:25-58.
    */
  private def q16Label(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_totalprice") < 100000.0, 0).otherwise(1).as("label"))
      .orderBy(col("o_orderkey"))

  private val q16Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice < 100000.0 THEN 0 ELSE 1 END AS label
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** J5 join on differently-named keys then drop the duplicate —
    * reference scripts/data_processing.py:223-224.
    */
  private def q17JoinDiffKeys(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"), "left")
      .drop(nat("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q17Sql =
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin

  /** A10 grouped sum → top-N selection (driver-side pandas in the
    * reference, folded into one Spark plan here) — reference
    * scripts/plotter.py:18,61.
    */
  private def q18SumTopN(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("total_value").desc, col("event_type"))
      .limit(3)

  private val q18Sql =
    """SELECT event_type, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY total_value DESC, event_type
      |LIMIT 3""".stripMargin

  /** A9 distribution counts (EDA histograms) —
    * reference analysis.ipynb cells 24,26,28,30.
    */
  private def q19Distribution(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))

  private val q19Sql =
    """SELECT o_orderpriority, count(*) AS cnt
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY cnt DESC, o_orderpriority""".stripMargin

  /** A7 describe()-style numeric summary, done as an explicit typed agg
    * (Spark's describe() returns strings; this keeps doubles) —
    * reference scripts/data_analysis.py:41.
    */
  private def q20Describe(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(count(col("l_quantity")).as("cnt"),
        round(avg(col("l_quantity")), 4).as("mean"),
        round(stddev(col("l_quantity")), 4).as("stddev"),
        min(col("l_quantity")).as("min"),
        max(col("l_quantity")).as("max"))

  private val q20Sql =
    """SELECT count(l_quantity) AS cnt,
      |  round(avg(l_quantity), 4) AS mean,
      |  round(stddev_samp(l_quantity), 4) AS stddev,
      |  min(l_quantity) AS min, max(l_quantity) AS max
      |FROM lineitem""".stripMargin

  /** Windowed-by-time aggregation (batch shape of the streaming
    * pipeline in graft.streaming): hour-bucket × event_type counts.
    * Extension beyond the reference (SURVEY.md §2.10 notes it has no
    * windows); included because a training-data pipeline needs it.
    */
  private def q21TimeBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("value"))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  private val q21Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01PricingSummary, Some(q01Sql)),
    Q("q02_filter_conj", q02FilterConj, Some(q02Sql)),
    Q("q03_bucket", q03Bucket, Some(q03Sql)),
    Q("q04_join_inner", q04JoinInner, Some(q04Sql)),
    Q("q05_join_broadcast", q05JoinBroadcast, Some(q05Sql)),
    Q("q06_join_left_agg", q06JoinLeftAgg, Some(q06Sql)),
    Q("q07_topk", q07TopK, Some(q07Sql)),
    Q("q08_explode_distinct", q08ExplodeDistinct, Some(q08Sql)),
    Q("q09_array_ops", q09ArrayOps, Some(q09Sql)),
    Q("q10_rlike", q10Rlike, Some(q10Sql)),
    Q("q11_onehot", q11OneHot, Some(q11Sql)),
    Q("q12_null_profile", q12NullProfile, Some(q12Sql)),
    Q("q13_trends", q13Trends, Some(q13Sql)),
    Q("q14_cond_agg", q14CondAgg, Some(q14Sql)),
    Q("q15_group_stats", q15GroupStats, Some(q15Sql)),
    Q("q16_label", q16Label, Some(q16Sql)),
    Q("q17_join_diff_keys", q17JoinDiffKeys, Some(q17Sql)),
    Q("q18_sum_topn", q18SumTopN, Some(q18Sql)),
    Q("q19_distribution", q19Distribution, Some(q19Sql)),
    Q("q20_describe", q20Describe, Some(q20Sql)),
    Q("q21_time_bucket", q21TimeBucket, Some(q21Sql)),
  )
}
