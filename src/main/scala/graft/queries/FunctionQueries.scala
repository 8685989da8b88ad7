package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar/aggregate function breadth: exact percentiles, date/time,
  * string, NULL-handling, and JSON extraction — each mirrored in
  * DuckDB for the oracle gate. Where the two engines' function
  * semantics differ (dayofweek origin), the mapping is explicit in
  * the SQL.
  */
object FunctionQueries {

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`).
    */
  private def q31Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
      .orderBy(col("l_returnflag"))

  private val q31Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Date/time function surface. Spark's dayofweek is 1-based
    * Sunday-first; DuckDB's is 0-based Sunday-first → +1 in the
    * oracle.
    */
  private def q32Datetime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy(col("o_orderkey"))

  private val q32Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
      |FROM orders
      |WHERE o_orderkey < 2000
      |ORDER BY o_orderkey""".stripMargin

  /** String function surface incl. edit distance. */
  private def q33Strings(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_brand"), 10, "#").as("brand_pad"),
        reverse(col("p_type")).as("type_rev"),
        levenshtein(col("p_type"), lit("STANDARD")).as("type_dist"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"))
      .orderBy(col("p_partkey"))

  private val q33Sql =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  substr(p_name, 1, 5) AS name_pfx,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  lpad(p_brand, 10, '#') AS brand_pad,
      |  reverse(p_type) AS type_rev,
      |  CAST(levenshtein(p_type, 'STANDARD') AS INTEGER) AS type_dist,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** NULL-handling surface: nullif to synthesize NULLs, coalesce /
    * fill to recover them, null-aware equality.
    */
  private def q34NullHandling(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_returnflag"), lit("A")).as("flag_or_null"))
      .select(col("l_orderkey"), col("l_linenumber"), col("flag_or_null"),
        coalesce(col("flag_or_null"), lit("defaulted")).as("flag_filled"),
        col("flag_or_null").isNull.cast("int").as("was_null"),
        (col("flag_or_null") <=> lit("R")).cast("int").as("null_safe_eq_r"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q34Sql =
    """SELECT l_orderkey, l_linenumber,
      |  nullif(l_returnflag, 'A') AS flag_or_null,
      |  coalesce(nullif(l_returnflag, 'A'), 'defaulted') AS flag_filled,
      |  CAST(nullif(l_returnflag, 'A') IS NULL AS INTEGER) AS was_null,
      |  CAST(nullif(l_returnflag, 'A') IS NOT DISTINCT FROM 'R' AS INTEGER) AS null_safe_eq_r
      |FROM lineitem
      |WHERE l_orderkey < 2000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** JSON extraction from the events.props string column + downstream
    * aggregation.
    */
  private def q35Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        // try_cast, not cast: get_json_object is NULL-safe on broken
        // JSON, but a VALID document whose k is non-numeric reaches
        // the cast and under ANSI aborts the whole aggregation
        // (CAST_INVALID_INPUT, probed) — one malformed producer must
        // not kill the metric job. DuckDB mirrors with TRY_CAST.
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  // json_valid guard (r12 chaos-parity drive): DuckDB's ->> THROWS on
  // a truncated document ('{"k":' — the malformed-producer chaos row)
  // where Spark's get_json_object is NULL-safe; the guard makes the
  // oracle degrade to the same NULL. No-op on well-formed props.
  private val q35Sql =
    """WITH ev AS (
      |  SELECT event_type,
      |    TRY_CAST((CASE WHEN json_valid(props) THEN props->>'$.k' END) AS INTEGER) AS k
      |  FROM events)
      |SELECT event_type,
      |  count(k) AS n_with_k,
      |  round(avg(k), 4) AS avg_k,
      |  CAST(min(k) AS INTEGER) AS min_k,
      |  CAST(max(k) AS INTEGER) AS max_k
      |FROM ev
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Sketch aggregates: HLL++ approximate distinct and approximate
    * percentiles per group — the bounded-memory forms of q31/A2 for
    * 100 TB cardinalities. Sketch internals are engine-specific →
    * rows-only in the gate; accuracy vs exact is asserted in
    * SketchSpec.
    */
  private def q38Sketches(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        round(element_at(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(1000)), 1), 4).as("approx_p50"),
        round(element_at(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(1000)), 2), 4).as("approx_p90"))
      .orderBy(col("l_returnflag"))

  /** Bivariate statistics per group: Pearson correlation, sample
    * covariance/variance (identical definitions in both engines;
    * rounded for float-order independence).
    */
  private def q39Stats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        round(var_samp(col("l_discount")), 6).as("var_disc"))
      .orderBy(col("l_returnflag"))

  private val q39Sql =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
      |  round(var_samp(l_discount), 6) AS var_disc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Array-function surface: sort/union/intersect/except/flatten over
    * token arrays built from two string columns.
    */
  private def q40Arrays(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        split(col("p_name"), " ").as("a"),
        array(col("p_type"), col("p_brand")).as("b"))
      .select(col("p_partkey"),
        array_sort(col("a")).as("sorted_name"),
        size(array_union(col("a"), col("b"))).as("n_union"),
        size(array_intersect(col("a"), col("b"))).as("n_common"),
        size(array_except(col("a"), col("b"))).as("n_only_name"),
        flatten(array(col("a"), col("b"))).as("all_tokens"))
      .select(col("p_partkey"),
        concat_ws("|", col("sorted_name")).as("sorted_name"),
        col("n_union"), col("n_common"), col("n_only_name"),
        concat_ws("|", col("all_tokens")).as("all_tokens"))
      .orderBy(col("p_partkey"))

  private val q40Sql =
    """WITH t AS (
      |  SELECT p_partkey, string_split(p_name, ' ') AS a,
      |    [p_type, p_brand] AS b
      |  FROM part
      |)
      |SELECT p_partkey,
      |  array_to_string(list_sort(a), '|') AS sorted_name,
      |  CAST(len(list_distinct(list_concat(a, b))) AS INTEGER) AS n_union,
      |  CAST(len(list_intersect(a, b)) AS INTEGER) AS n_common,
      |  CAST(len(list_filter(list_distinct(a), x -> NOT list_contains(b, x))) AS INTEGER) AS n_only_name,
      |  array_to_string(list_concat(a, b), '|') AS all_tokens
      |FROM t
      |ORDER BY p_partkey""".stripMargin

  /** Generator NULL semantics: explode_outer keeps rows whose array is
    * NULL (vs explode's silent drop, F2) — mirrored in DuckDB with a
    * LEFT JOIN LATERAL unnest.
    */
  private def q41ExplodeOuter(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        explode_outer(split(nullif(col("p_type"), lit("ECONOMY")), " ")).as("token"))
      .orderBy(col("p_partkey"), col("token"))

  private val q41Sql =
    """SELECT p_partkey, t.token
      |FROM part
      |LEFT JOIN LATERAL (
      |  SELECT unnest(string_split(nullif(p_type, 'ECONOMY'), ' ')) AS token
      |) t ON TRUE
      |ORDER BY p_partkey, token""".stripMargin

  /** Map-typed columns: build a map, probe keys, enumerate sorted
    * keys. Scalar/array outputs so the oracle comparison stays typed.
    */
  private def q42MapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        map(lit("status"), col("o_orderstatus"),
          lit("prio"), col("o_orderpriority")).as("m"))
      .select(col("o_orderkey"),
        element_at(col("m"), "status").as("status_val"),
        element_at(col("m"), "missing").as("missing_val"),
        size(col("m")).as("n_entries"),
        concat_ws("|", array_sort(map_keys(col("m")))).as("keys_sorted"))
      .orderBy(col("o_orderkey"))

  private val q42Sql =
    """SELECT o_orderkey,
      |  map_extract(m, 'status')[1] AS status_val,
      |  map_extract(m, 'missing')[1] AS missing_val,
      |  CAST(cardinality(m) AS INTEGER) AS n_entries,
      |  array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted
      |FROM (
      |  SELECT o_orderkey,
      |    MAP {'status': o_orderstatus, 'prio': o_orderpriority} AS m
      |  FROM orders WHERE o_orderkey < 1000
      |)
      |ORDER BY o_orderkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q31_percentiles", q31Percentiles, Some(q31Sql)),
    Q("q32_datetime", q32Datetime, Some(q32Sql)),
    Q("q33_strings", q33Strings, Some(q33Sql)),
    Q("q34_null_handling", q34NullHandling, Some(q34Sql)),
    Q("q35_json", q35Json, Some(q35Sql)),
    Q("q38_sketches", q38Sketches, None),
    Q("q39_stats", q39Stats, Some(q39Sql)),
    Q("q40_arrays", q40Arrays, Some(q40Sql)),
    Q("q41_explode_outer", q41ExplodeOuter, Some(q41Sql)),
    Q("q42_map_funcs", q42MapFuncs, Some(q42Sql)),
  )
}
