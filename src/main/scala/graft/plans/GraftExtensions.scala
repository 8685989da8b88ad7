package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Md5Hash48, ZOrder2}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions in the SQL function registry so `spark.sql` users get
  * them too (`SELECT graft_dot(a, b)`), not just the Column API.
  *
  * Wire up with either
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  * or programmatically `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.zOrderDescriptor)
    ext.injectFunction(GraftExtensions.md5Hash48Descriptor)
    ext.injectPlannerStrategy(_ => new AsofStrategy)
    ext.injectOptimizerRule(_ => new AsofLimitPushDown)
  }
}

object GraftExtensions {
  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(a, b) takes exactly two array arguments")
      DotProduct(children.head, children(1))
    })

  val zOrderDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_zorder2"),
    new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder2"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_zorder2(x, y) takes exactly two integral arguments")
      ZOrder2(children.head, children(1))
    })

  val md5Hash48Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_md5h48"),
    new ExpressionInfo(classOf[Md5Hash48].getName, "graft_md5h48"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_md5h48(s) takes exactly one string argument")
      Md5Hash48(children.head)
    })

  /** Register on an existing session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(dotProductDescriptor, zOrderDescriptor, md5Hash48Descriptor)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
    registerStrategy(spark)
  }

  /** Idempotently add the as-of planner strategy + optimizer rule to
    * an existing session (the extensions-config path injects them at
    * build time; this covers sessions built without it).
    */
  def registerStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsofStrategy])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsofStrategy
    }
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AsofLimitPushDown])) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new AsofLimitPushDown
    }
  }
}
