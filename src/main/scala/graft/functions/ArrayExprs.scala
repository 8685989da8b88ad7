package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Merge-scan kernel for sorted long arrays. A Scala object emits
  * static forwarders (the HashKernels pattern), so generated Java calls
  * `graft.functions.ArrayKernels.sortedIntersectCount(a, b)` directly.
  */
object ArrayKernels {
  /** Count of DISTINCT common values of two ASCENDING-sorted long
    * arrays — one linear merge scan, no per-row hash-set allocation.
    * Duplicate runs collapse (a value counted once no matter how many
    * times it repeats on either side), so on sorted inputs this equals
    * `size(array_intersect(a, b))` exactly, including when the inputs
    * carry duplicates. O(n + m) vs array_intersect's per-call
    * OpenHashSet build — the difference is ~4× on the dd18 verify pass,
    * where the intersect runs once per CANDIDATE pair (125k pairs at
    * sf0.1; candidates × avg doc shingles everywhere).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    var last = 0L
    var hasLast = false
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        if (!hasLast || x != last) { c += 1; last = x; hasLast = true }
        i += 1
        j += 1
      }
    }
    c
  }
}

/** `|a ∩ b|` of two ascending-sorted array<bigint> columns, value-
  * identical to `size(array_intersect(a, b))::long` on sorted inputs
  * (ExtensionsSpec pins the equality on real shingle sets). CALLER
  * CONTRACT: both arrays sorted ascending (e.g. built with
  * `sort_array(collect_list(...))`) — unsorted input silently
  * undercounts, the same class of contract as DotProduct's equal-length
  * assumption. NULL array on either side → NULL, matching
  * array_intersect; null ELEMENTS are out of contract (every caller
  * feeds md5-derived non-null hashes, and collect_list never emits null
  * slots).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayKernels.sortedIntersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayKernels.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayFns {
  /** Column wrapper for [[SortedIntersectCount]] (the md5Hash48
    * bridge pattern).
    */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(SortedIntersectCount(expression(a), expression(b)))
  }
}
