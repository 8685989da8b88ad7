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
  /** Shared union+window composition behind the as-of family. The
    * right rows are interleaved with the left rows in `tsOrder`
    * (right-before-left at equal timestamps → inclusive matches), and
    * each left row resolves the nearest preceding-in-order right value
    * (and, when `carryMatchTs`, its timestamp) via ignoreNulls window
    * lasts. Assumes non-null right `valueCol` rows — the two lasts
    * desync if a right row carries a NULL value.
    */
  private def asofComposition(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      descending: Boolean, carryMatchTs: Boolean): DataFrame = {
    require(!left.columns.contains(valueCol),
      s"as-of join: left already has a column named '$valueCol'; " +
        "rename it (the as-of value column is appended to the left schema)")
    val leftCols = left.columns
    val l = left
      .withColumn("__is_right", lit(0))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__is_right"), col(valueCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val tsOrder = if (descending) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = l.unionByName(r)
    val withTs =
      if (carryMatchTs) base.withColumn("__match_ts",
        last(when(col("__is_right") === 1, col(tsCol)), ignoreNulls = true).over(w))
      else base
    withTs
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .drop("__is_right")
  }

  def asofJoinLatest(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame =
    asofComposition(left, right, keyCol, tsCol, valueCol,
      descending = false, carryMatchTs = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * right.ts >= left.ts per key (pandas merge_asof
    * direction='forward') — the lookahead twin of [[asofJoinLatest]],
    * same one-shuffle composition over the reversed time order.
    */
  def asofJoinNext(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame =
    asofComposition(left, right, keyCol, tsCol, valueCol,
      descending = true, carryMatchTs = false)

  /** As-of join with a staleness bound (pandas merge_asof `tolerance`
    * / kdb wj shape): like [[asofJoinLatest]], but a match older than
    * `toleranceMicros` before the left timestamp is nulled out — the
    * standard guard against joining against stale reference data.
    */
  def asofJoinLatestWithin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      toleranceMicros: Long): DataFrame =
    asofComposition(left, right, keyCol, tsCol, valueCol,
      descending = false, carryMatchTs = true)
      .withColumn(valueCol,
        when(unix_micros(col(tsCol)) - unix_micros(col("__match_ts")) <= toleranceMicros,
          col(valueCol)))
      .drop("__match_ts")

  /** Same semantics through the custom whole-operator path
    * (graft.plans.AsofJoin → AsofMergeJoinExec): preference tier (c),
    * used when inputs are bucketed/sorted by key so the merge runs
    * shuffle-free — the composition above can't avoid its window
    * shuffle. Results are identical (AsOfSpec asserts it; the q36
    * DuckDB oracle checks both).
    */
  def asofJoinLatestExec(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    graft.plans.GraftExtensions.registerStrategy(spark)
    val lPlan = GraftPlanBridge.analyzed(left)
    // NULL right keys/timestamps can never match; dropping them up
    // front keeps the merge loop tight. Fresh aliases give the right
    // side new exprIds — both sides usually derive from the same scan,
    // and duplicate ids across children would confuse column pruning.
    val rPlan0 = GraftPlanBridge.analyzed(
      right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull))
    val rPlan = Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) = {
      val matches = plan.output.filter(_.name == name)
      require(matches.size == 1,
        s"asofJoinLatestExec: expected exactly one column '$name' in " +
          s"${plan.output.map(_.name)}, found ${matches.size}")
      matches.head
    }
    val node = graft.plans.AsofJoin(lPlan, rPlan,
      attr(lPlan, keyCol), attr(rPlan, keyCol),
      attr(lPlan, tsCol), attr(rPlan, tsCol),
      Seq(attr(rPlan, valueCol)))
    GraftPlanBridge.ofRows(spark, node)
  }
}
