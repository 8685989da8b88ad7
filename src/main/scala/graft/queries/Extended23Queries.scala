package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 fourth wave: the column-profiling audit that completes the
  * data-quality family (dq01 constraints, dq02 drift, dq03 Benford,
  * dq04 FK keys, dq05 outliers, dq06 value reconciliation, dq07
  * this).
  */
object Extended23Queries {

  /** Candidate-key / uniqueness profile of orders: per column, its
    * distinct count, null count, distinct ratio, and whether it is a
    * candidate key (distinct == non-null rows == all rows). One
    * Expand-based aggregate pass (Spark plans the multi-column
    * count-distinct as a single shuffle); no per-column jobs. The
    * profiling pass every schema-inference / dedup-key decision
    * starts from.
    */
  private def dq07KeyProfile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap { c =>
        Seq(countDistinct(col(c)).as(s"d_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"z_$c"))
      }
    val st = o.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', d_$c, z_$c"
    }.mkString("stack(" + cols.length + ", ", ", ", ") AS (col_name, n_distinct, n_nulls)")
    st.select(col("n_rows"), expr(stacked))
      .select(col("col_name"), col("n_rows"), col("n_distinct"), col("n_nulls"),
        round(col("n_distinct") / col("n_rows"), 4).as("distinct_ratio"),
        (col("n_distinct") === col("n_rows") && col("n_nulls") === 0)
          .as("is_candidate_key"))
      .orderBy(col("col_name"))
  }

  private val dq07Sql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val branches = cols.map { c =>
      s"""  SELECT '$c' AS col_name, count(*) AS n_rows,
         |    count(DISTINCT $c) AS n_distinct,
         |    sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS n_nulls
         |  FROM orders""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_distinct AS BIGINT) AS n_distinct,
       |  CAST(n_nulls AS BIGINT) AS n_nulls,
       |  round(n_distinct / CAST(n_rows AS DOUBLE), 4) AS distinct_ratio,
       |  (n_distinct = n_rows AND n_nulls = 0) AS is_candidate_key
       |FROM (
       |$branches
       |)
       |ORDER BY col_name""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("dq07_key_profile", dq07KeyProfile, Some(dq07Sql)))
}
