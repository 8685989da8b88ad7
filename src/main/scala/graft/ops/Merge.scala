package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch CDC primitives — the upsert/diff half of a warehouse-less
  * lakehouse pipeline (what MERGE INTO / table-format diffs do,
  * expressed as plain full-outer joins so they run on any store).
  *
  * Scale posture: both ops are single full-outer shuffles on the key
  * (or shuffle-free when both sides are bucketed by it); at 100 TB the
  * updates side is typically a small CDC batch, which AQE turns into a
  * broadcast-ish join automatically.
  */
object Merge {

  /** Upsert `updates` into `target` by `key`: matching rows take the
    * update's columns, unmatched target rows pass through, unmatched
    * update rows are inserts. Column sets must match. NULL values in
    * an update column do NOT overwrite the target (coalesce
    * semantics) — model deletions with [[snapshotDiff]] or an explicit
    * tombstone column instead.
    */
  def mergeUpsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"mergeUpsert needs matching column sets, got " +
        s"${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val dataCols = target.columns.filter(_ != key).toSeq
    val t = target.select(col(key) +: dataCols.map(c => col(c).as(s"__t_$c")): _*)
    val u = updates.select(col(key) +: dataCols.map(c => col(c).as(s"__u_$c")): _*)
    t.join(u, Seq(key), "full_outer")
      .select(col(key) +: dataCols.map(c =>
        coalesce(col(s"__u_$c"), col(s"__t_$c")).as(c)): _*)
  }

  /** Snapshot diff: classify rows as added / removed / changed between
    * two versions of a keyed table, comparing `compareCols`
    * null-safely. Unchanged rows are dropped — the output is the CDC
    * stream a downstream consumer would apply.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    // presence markers, not null-checks on data columns: a legitimate
    // all-NULL row in one snapshot must not masquerade as added/removed
    val o = oldDf.select(col(key) +: (compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old")): _*)
    val n = newDf.select(col(key) +: (compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new")): _*)
    val anyDiff = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(anyDiff, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .drop("__in_old", "__in_new")
  }
}
