package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (for each left row, the latest right row with
  * right.ts <= left.ts per key) — the canonical "operator Spark
  * lacks". Composed from built-ins per the preference order (a):
  * tag + union + per-key time-ordered window + last_value(ignoreNulls),
  * then keep the left rows. One shuffle on (key), no custom physical
  * operator needed; at scale this is a single repartition + in-window
  * scan, the same cost profile a dedicated SparkPlan would have.
  *
  * Ties: right rows at exactly left.ts win (inclusive as-of, matching
  * DuckDB's ASOF JOIN `>=` default, which the oracle uses). Callers
  * should pre-aggregate the right side to unique (key, ts) — with
  * duplicates the winning row is engine-dependent.
  */
object AsOf {

  /** @param left     probe side; must carry `keyCol` and `tsCol`
    * @param right    reference side with unique (keyCol, tsCol) rows
    * @param valueCol the right-side column carried to the output (NULL
    *                 when no right row precedes the left row)
    */
  def asofJoinLatest(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    require(!left.columns.contains(valueCol),
      s"asofJoinLatest: left already has a column named '$valueCol'; " +
        "rename it (the as-of value column is appended to the left schema)")
    val leftCols = left.columns
    val l = left
      .withColumn("__is_right", lit(0))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__is_right"), col(valueCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .drop("__is_right")
  }
}
