package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (SURVEY.md preference tier (c)): a custom
  * logical node, planner strategy, and sort-merge physical operator.
  *
  * Semantics match `ops.AsOf.asofJoinLatest` (and DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`): every left
  * row is joined to the LATEST right row of the same key with
  * `right.ts <= left.ts`, or NULL-padded when none precedes it.
  *
  * Why a custom SparkPlan here: the built-in composition (union +
  * window) must null-pad both sides to a common wide schema and sort
  * the combined data; this operator instead declares the textbook
  * merge-join requirements — children clustered on the key and sorted
  * by (key, ts) — and streams both sides through a single-pass
  * two-pointer merge per partition. EnsureRequirements inserts
  * exchanges/sorts only when the children aren't already co-located,
  * so bucketed-by-key inputs (ops.Scale.writeBucketed) as-of join with
  * ZERO shuffles, which no built-in composition can express.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[NamedExpression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule completing the extension trio (expression /
  * strategy / rule): push a limit into the as-of join's LEFT child.
  * The operator emits exactly one row per left row, so limiting the
  * probe side first is semantics-preserving — the same rewrite
  * Catalyst's LimitPushDown applies to the streamed side of outer
  * joins, which cannot know about this node. At scale this turns
  * "LIMIT n over an as-of join of two huge tables" into an as-of join
  * of n rows against one table.
  */
class AsofLimitPushDown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case g @ GlobalLimit(_, ll @ LocalLimit(le, j: AsofJoin))
        if !j.left.isInstanceOf[LocalLimit] =>
      g.copy(child = ll.copy(child = j.copy(left = LocalLimit(le, j.left))))
  }
}

class AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, vals) =>
      AsofMergeJoinExec(lk, rk, lts, rts, vals, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children are hash-clustered on the key and
  * sorted by (key, ts); each partition pair is merged in one linear
  * pass holding exactly ONE buffered candidate row — O(|L|+|R|) time,
  * O(1) state, no materialized hash table, spill-free by construction.
  *
  * Null handling: left rows with NULL key/ts emit NULL-padded output
  * (SQL join semantics — NULL matches nothing); right rows with NULL
  * key/ts are skipped defensively (the API wrapper also filters them).
  */
case class AsofMergeJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[NamedExpression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.toAttribute.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val valueExprs: Seq[Expression] = rightValues
    val (leftOut, rightOut, outAttrs) = (left.output, right.output, output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), leftOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), rightOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOut)
      val valProj = UnsafeProjection.create(valueExprs, rightOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(valueExprs.length)
      val rBuf = rIter.buffered
      // the one buffered candidate: latest right row consumed so far
      // (its key, copied out of the transient projection buffer)
      var mKey: Any = null
      var mVal: InternalRow = null
      var mSet = false
      lIter.map { lRow =>
        val lKeyVal = lKeyProj(lRow).get(0, keyType)
        val lTsVal = lTsProj(lRow).get(0, tsType)
        if (lKeyVal == null || lTsVal == null) {
          outProj(joined(lRow, nullRight))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val h = rBuf.head
            val rKeyVal = rKeyProj(h).get(0, keyType)
            if (rKeyVal == null) { rBuf.next(); mSet = false }
            else {
              val c = keyOrd.compare(rKeyVal, lKeyVal)
              if (c < 0) { rBuf.next(); mSet = false }
              else if (c == 0) {
                val rTsVal = rTsProj(h).get(0, tsType)
                if (rTsVal != null && tsOrd.compare(rTsVal, lTsVal) <= 0) {
                  mKey = InternalRow.copyValue(rKeyVal)
                  mVal = valProj(h).copy()
                  mSet = true
                  rBuf.next()
                } else if (rTsVal == null) rBuf.next()
                else advance = false
              } else advance = false
            }
          }
          val ok = mSet && keyOrd.compare(mKey, lKeyVal) == 0
          outProj(joined(lRow, if (ok) mVal else nullRight))
        }
      }
    }
  }
}
