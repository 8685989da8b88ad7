package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening of the verified relational surface: grouping sets,
  * value/range window frames, distribution windows, generator
  * ordinality, unpivot, correlated subqueries, argmax aggregates,
  * bit/hash functions, and the remaining join types (full outer,
  * cross). All oracle-checked against DuckDB; every query ends in a
  * deterministic total-order sort (Catalog contract).
  */
object Extended2Queries {

  /** GROUPING SETS with grouping() disambiguation — finer-grained than
    * rollup/cube (q25/q26): the (status) and (priority) slices plus the
    * grand total, no cross level.
    */
  private def q43GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
        |  count(*) AS n
        |FROM v_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val q43Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** RANGE window frame (value-based, not row-based): average retail
    * price of parts within ±5 size units of each part.
    */
  private def q44RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("p_size")).rangeBetween(-5, 5)
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size"),
        round(avg(col("p_retailprice")).over(w), 2).as("nearby_avg"))
      .orderBy(col("p_partkey"))
  }

  private val q44Sql =
    """SELECT p_partkey, p_size,
      |  round(avg(p_retailprice) OVER (
      |    ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING), 2) AS nearby_avg
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Distribution windows: quartile (ntile), percent_rank, cume_dist
    * over customer balances — unique total order so ntile is
    * deterministic.
    */
  private def q45DistWindows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("c_custkey"))
  }

  private val q45Sql =
    """SELECT c_custkey, CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Navigation functions across frames: first/last/nth order per
    * customer (explicit full frame for last/nth) and lead with a
    * default for the final row.
    */
  private def q46FirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_k"),
        last(col("o_orderkey")).over(full).as("last_k"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_k"),
        lead(col("o_orderkey"), 1, -1).over(w).as("next_k"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q46Sql =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_k,
      |  last_value(o_orderkey) OVER wf AS last_k,
      |  nth_value(o_orderkey, 2) OVER wf AS second_k,
      |  lead(o_orderkey, 1, -1) OVER w AS next_k
      |FROM orders
      |WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Generator with ordinality: posexplode of the part-name tokens
    * (pos is the 0-based token index).
    */
  private def q47Posexplode(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
      .orderBy(col("p_partkey"), col("pos"))

  private val q47Sql =
    """SELECT p_partkey,
      |  CAST(unnest(range(len(string_split(p_name, ' ')))) AS INTEGER) AS pos,
      |  unnest(string_split(p_name, ' ')) AS tok
      |FROM part
      |ORDER BY p_partkey, pos""".stripMargin

  /** Unpivot/melt (wide → long), the inverse of q29's pivot. */
  private def q48Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").as("price"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("price")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  private val q48Sql =
    """SELECT p_partkey, metric, value FROM (
      |  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
      |           p_retailprice AS price FROM part)
      |  ON size, price INTO NAME metric VALUE value)
      |ORDER BY p_partkey, metric""".stripMargin

  /** Correlated EXISTS / NOT EXISTS through the SQL entry point (the
    * subquery-form dual of q28's semi/anti joins — Catalyst rewrites
    * these to the same physical joins).
    */
  private def q49ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_custkey, 'urgent_buyer' AS tag FROM v_customer
        |WHERE EXISTS (SELECT 1 FROM v_orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT c_custkey, 'no_urgent' AS tag FROM v_customer
        |WHERE NOT EXISTS (SELECT 1 FROM v_orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY tag, c_custkey""".stripMargin)
  }

  private val q49Sql =
    """SELECT c_custkey, 'urgent_buyer' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT c_custkey, 'no_urgent' AS tag FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY tag, c_custkey""".stripMargin

  /** Scalar subquery: brands priced above the global average. */
  private def q50ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    s.sql(
      """SELECT p_brand, count(*) AS n_above
        |FROM v_part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM v_part)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  private val q50Sql =
    """SELECT p_brand, count(*) AS n_above
      |FROM part
      |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Ordered string aggregation (listagg): nation names per region,
    * sorted — collect_list order is nondeterministic under parallel
    * aggregation, so sort the array before joining.
    */
  private def q51StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .groupBy(col("n_regionkey"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  private val q51Sql =
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names,
      |  count(*) AS n
      |FROM nation
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin

  /** Argmax aggregates: richest/poorest supplier name per nation
    * (max_by/min_by ≡ DuckDB arg_max/arg_min).
    */
  private def q52ArgMax(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .groupBy(col("s_nationkey"))
      // Composite ordering key breaks acctbal ties on name so the
      // result is deterministic (both engines' arg_max are otherwise
      // free to pick any tied row). DuckDB's arg_max can't order by a
      // struct, so both sides use lexicographic struct max/min + field
      // extraction — identical semantics.
      .agg(max_by(col("s_name"), struct(col("s_acctbal"), col("s_name"))).as("richest"),
        min_by(col("s_name"), struct(col("s_acctbal"), col("s_name"))).as("poorest"),
        round(max(col("s_acctbal")), 2).as("top_bal"))
      .orderBy(col("s_nationkey"))

  private val q52Sql =
    """SELECT s_nationkey, max(struct_pack(b := s_acctbal, n := s_name)).n AS richest,
      |  min(struct_pack(b := s_acctbal, n := s_name)).n AS poorest,
      |  round(max(s_acctbal), 2) AS top_bal
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** Conditional scalar surface: greatest/least/nullif/coalesce row
    * math over lineitem rates.
    */
  private def q53Conditional(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(greatest(col("l_tax"), col("l_discount")), 2).as("max_rate"),
        round(least(col("l_tax"), col("l_discount")), 2).as("min_rate"),
        round(coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)), 2)
          .as("disc_or_sentinel"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q53Sql =
    """SELECT l_orderkey, l_linenumber,
      |  round(greatest(l_tax, l_discount), 2) AS max_rate,
      |  round(least(l_tax, l_discount), 2) AS min_rate,
      |  round(coalesce(nullif(l_discount, 0.0), -1.0), 2) AS disc_or_sentinel
      |FROM lineitem
      |WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Regex surface beyond rlike: group extraction and match counting.
    * The classes are spelled out instead of `\w`/`\s`: Java regex and
    * the oracle's RE2 disagree on shorthand membership (`\s` includes
    * \x0B in RE2 but not pre-Java-18 Java; Unicode-aware `\w` differs
    * by flags), and p_name being plain-ASCII today must not be what
    * keeps the two engines agreeing (VERDICT r10 #5; same policy as
    * TextStats.Ws).
    */
  private val WordRun = "[A-Za-z0-9_]+"
  private val WsClass = graft.text.TextStats.WsClass

  private def q54Regexp(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), s"^($WordRun)$WsClass", 1).as("first_word"),
        regexp_count(col("p_name"), lit("a")).cast("int").as("n_a"))
      .orderBy(col("p_partkey"))

  private val q54Sql =
    s"""SELECT p_partkey,
      |  regexp_extract(p_name, '^($WordRun)$WsClass', 1) AS first_word,
      |  CAST(len(regexp_extract_all(p_name, 'a')) AS INTEGER) AS n_a
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Bitwise ops + cryptographic hash functions (stable row
    * fingerprints for change-data capture at scale).
    */
  private def q55BitwiseHash(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255)).cast("long").as("band"),
        col("p_partkey").bitwiseXOR(lit(42)).cast("long").as("bxor"),
        shiftleft(col("p_partkey"), 2).cast("long").as("shl"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"))
      .orderBy(col("p_partkey"))

  private val q55Sql =
    """SELECT p_partkey,
      |  CAST(p_partkey & 255 AS BIGINT) AS band,
      |  CAST(xor(p_partkey, 42) AS BIGINT) AS bxor,
      |  CAST(p_partkey << 2 AS BIGINT) AS shl,
      |  md5(p_name) AS h_md5,
      |  sha256(p_name) AS h_sha256
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Full outer join with unmatched rows on BOTH sides (customer slice
    * vs order-count slice over disjoint-but-overlapping key ranges).
    */
  private def q56FullOuter(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_custkey") < 1000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ords = Tables.orders(s, dir)
      .filter(col("o_custkey") >= 500)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
      .select(
        coalesce(cust("c_custkey"), ords("o_custkey")).as("custkey"),
        col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("custkey"))
  }

  private val q56Sql =
    """WITH cust AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 1000),
      |ords AS (SELECT o_custkey, count(*) AS n_orders FROM orders
      |         WHERE o_custkey >= 500 GROUP BY o_custkey)
      |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
      |  coalesce(n_orders, 0) AS n_orders
      |FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  /** Cross join (explicit cartesian): unordered region pairs. */
  private def q57CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val r1 = Tables.region(s, dir).select(col("r_name").as("a"))
    val r2 = Tables.region(s, dir).select(col("r_name").as("b"))
    r1.crossJoin(r2).filter(col("a") < col("b")).orderBy(col("a"), col("b"))
  }

  private val q57Sql =
    """SELECT r1.r_name AS a, r2.r_name AS b
      |FROM region r1 CROSS JOIN region r2
      |WHERE r1.r_name < r2.r_name
      |ORDER BY a, b""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q43_grouping_sets", q43GroupingSets, Some(q43Sql)),
    Q("q44_range_frame", q44RangeFrame, Some(q44Sql)),
    Q("q45_dist_windows", q45DistWindows, Some(q45Sql)),
    Q("q46_first_last", q46FirstLast, Some(q46Sql)),
    Q("q47_posexplode", q47Posexplode, Some(q47Sql)),
    Q("q48_unpivot", q48Unpivot, Some(q48Sql)),
    Q("q49_exists_subquery", q49ExistsSubquery, Some(q49Sql)),
    Q("q50_scalar_subquery", q50ScalarSubquery, Some(q50Sql)),
    Q("q51_string_agg", q51StringAgg, Some(q51Sql)),
    Q("q52_argmax", q52ArgMax, Some(q52Sql)),
    Q("q53_conditional", q53Conditional, Some(q53Sql)),
    Q("q54_regexp", q54Regexp, Some(q54Sql)),
    Q("q55_bitwise_hash", q55BitwiseHash, Some(q55Sql)),
    Q("q56_full_outer", q56FullOuter, Some(q56Sql)),
    Q("q57_cross_join", q57CrossJoin, Some(q57Sql)),
  )
}
