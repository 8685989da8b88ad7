package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 thirteenth wave: two warehouse staples — SCD Type-2
  * interval construction (turn an event stream into versioned
  * validity ranges) and largest-remainder proration (allocate an
  * integer total across weighted lines so the cents sum EXACTLY —
  * the penny-allocation problem every billing pipeline solves).
  */
object Extended17Queries {

  // ---------------------------------------------------------------- q101

  /** SCD2 dimension build from the event stream: each user's
    * event_type is the tracked attribute; consecutive duplicates
    * collapse; every change opens a version with valid_from = its
    * event time and valid_to = the next version's start (NULL while
    * current). Ordering ties on ts break by event_id — cross-engine
    * deterministic. All windows partition by user.
    */
  private def q101Scd2(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id") < 100)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(wo))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val wv = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    changes
      .withColumn("version", row_number().over(wv))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(wv))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
      .orderBy(col("user_id"), col("version"))
  }

  private val q101Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, event_type
      |  FROM events WHERE user_id < 100),
      |marked AS (
      |  -- NULLS FIRST explicitly: Spark ASC defaults nulls-first,
      |  -- DuckDB nulls-last — a NULL-ts event otherwise lands at
      |  -- opposite ends of the version history (r12 chaos parity)
      |  SELECT *, lag(event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) AS prev_type
      |  FROM e),
      |changes AS (
      |  SELECT * FROM marked
      |  WHERE prev_type IS NULL OR prev_type != event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
      |    AS INTEGER) AS version,
      |  event_type AS state,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id),
      |    '%Y-%m-%d %H:%M:%S') AS valid_to
      |FROM changes
      |ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- q102

  /** Largest-remainder (Hamilton) proration: each order's total cents
    * are allocated to its lineitems proportionally to extended price,
    * floor first, then the leftover pennies go to the largest
    * fractional remainders (linenumber breaks ties). Pure integer
    * arithmetic end to end — T·w ≤ 1e16 stays in long — so the
    * invariant Σ alloc = T holds EXACTLY, which is the entire point
    * of the method (a naive round() leaks pennies). One join + two
    * per-order windows; 10% order sample keeps the gate output
    * bounded.
    */
  private def q102Proration(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("t"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("w"))
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("w"), col("t"))
    val ww = Window.partitionBy(col("l_orderkey"))
    val based = joined
      .withColumn("tw", sum(col("w")).over(ww))
      .withColumn("base", expr("(t * w) div tw"))
      .withColumn("frac", expr("(t * w) % tw"))
      .withColumn("leftover", col("t") - sum(col("base")).over(ww))
    val wr = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("frac").desc, col("l_linenumber"))
    based
      .withColumn("rk", row_number().over(wr))
      .withColumn("alloc_cents",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("l_orderkey"), col("l_linenumber"), col("w").as("price_cents"),
        col("alloc_cents"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q102Sql =
    """WITH o AS (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS t
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |li AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS w
      |  FROM lineitem),
      |joined AS (
      |  SELECT li.l_orderkey, li.l_linenumber, li.w, o.t
      |  FROM li JOIN o ON li.l_orderkey = o.o_orderkey),
      |based AS (
      |  SELECT *,
      |    sum(w) OVER (PARTITION BY l_orderkey) AS tw,
      |    (t * w) // sum(w) OVER (PARTITION BY l_orderkey) AS base,
      |    (t * w) % sum(w) OVER (PARTITION BY l_orderkey) AS frac
      |  FROM joined),
      |lo AS (
      |  SELECT *, t - sum(base) OVER (PARTITION BY l_orderkey) AS leftover
      |  FROM based)
      |SELECT l_orderkey, l_linenumber, CAST(w AS BIGINT) AS price_cents,
      |  CAST(base + CASE WHEN row_number() OVER (
      |      PARTITION BY l_orderkey ORDER BY frac DESC, l_linenumber)
      |    <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_cents
      |FROM lo
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q101_scd2", q101Scd2, Some(q101Sql)),
    Q("q102_proration", q102Proration, Some(q102Sql)),
  )
}
