package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Operators beyond the reference's surface (SURVEY.md §2.10 lists
  * them as absent) that a complete engine needs: window functions,
  * set operations, semi/anti joins, rollup/cube, pivot, and the
  * spark.sql entry point. All oracle-checked against DuckDB.
  */
object ExtendedQueries {

  /** Ranking windows: top-3 customers by balance per market segment. */
  private def q22WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  private val q22Sql =
    """SELECT c_mktsegment, CAST(rnk AS INTEGER) AS rnk, c_custkey, c_acctbal
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer
      |)
      |WHERE rnk <= 3
      |ORDER BY c_mktsegment, rnk""".stripMargin

  /** Running aggregation window: cumulative spend per customer over
    * order time (explicit ROWS frame so tie semantics match exactly).
    */
  private def q23WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q23Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      |FROM orders
      |WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** lag/lead: gap in days between consecutive orders per customer. */
  private def q24WindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q24Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                              ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS INTEGER) AS days_since_prev
      |FROM orders
      |WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ROLLUP: order counts at (status, priority), (status), () levels. */
  private def q25Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q25Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** CUBE over returnflag × linestatus. */
  private def q26Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q26Sql =
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set ops: buying BUILDING-segment customers = segment ∩ purchasers
    * via INTERSECT; non-buyers via EXCEPT. Tagged union of both.
    */
  private def q27SetOps(s: SparkSession, dir: String): DataFrame = {
    val segment = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val buyers = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    segment.intersect(buyers).withColumn("tag", lit("buyer"))
      .unionByName(segment.except(buyers).withColumn("tag", lit("non_buyer")))
      .orderBy(col("tag"), col("c_custkey"))
  }

  private val q27Sql =
    """WITH segment AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |buyers AS (SELECT o_custkey AS c_custkey FROM orders)
      |SELECT c_custkey, 'buyer' AS tag FROM (SELECT * FROM segment INTERSECT SELECT * FROM buyers)
      |UNION ALL
      |SELECT c_custkey, 'non_buyer' AS tag FROM (SELECT * FROM segment EXCEPT SELECT * FROM buyers)
      |ORDER BY tag, c_custkey""".stripMargin

  /** Semi/anti joins: suppliers with/without any lineitem. */
  private def q28SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val li = Tables.lineitem(s, dir).select(col("l_suppkey"))
    sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), lit("active").as("status"))
      .unionByName(
        sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_anti")
          .select(col("s_suppkey"), lit("inactive").as("status")))
      .orderBy(col("status"), col("s_suppkey"))
  }

  private val q28Sql =
    """SELECT s_suppkey, 'active' AS status FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |UNION ALL
      |SELECT s_suppkey, 'inactive' AS status FROM supplier
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |ORDER BY status, s_suppkey""".stripMargin

  /** Pivot (the scalable form of the reference's one-hot loop,
    * SURVEY.md §4.3 item 4): order counts per year × status.
    */
  private def q29Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("yr"))

  private val q29Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
      |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
      |  CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
      |FROM orders
      |GROUP BY 1
      |ORDER BY yr""".stripMargin

  /** spark.sql entry point over registered views — TPC-H Q3 shape
    * (revenue of un-shipped orders per order/date/priority, top 10).
    */
  private def q30SqlEntry(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate, o_orderpriority
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  private val q30Sql =
    """SELECT o_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q22_window_rank", q22WindowRank, Some(q22Sql)),
    Q("q23_window_running", q23WindowRunning, Some(q23Sql)),
    Q("q24_window_lag", q24WindowLag, Some(q24Sql)),
    Q("q25_rollup", q25Rollup, Some(q25Sql)),
    Q("q26_cube", q26Cube, Some(q26Sql)),
    Q("q27_set_ops", q27SetOps, Some(q27Sql)),
    Q("q28_semi_anti", q28SemiAnti, Some(q28Sql)),
    Q("q29_pivot", q29Pivot, Some(q29Sql)),
    Q("q30_sql_entry", q30SqlEntry, Some(q30Sql)),
  )
}
