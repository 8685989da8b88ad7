package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared MD5 kernel for the codegen'd hash expression. A Scala object
  * emits static forwarders, so generated Java can call
  * `graft.functions.HashKernels.hash48(bytes)` directly; the
  * thread-local digest avoids one `MessageDigest.getInstance`
  * allocation per row (the commons-codec path Spark's own md5() takes
  * allocates one per call).
  */
object HashKernels {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 6 digest bytes as a big-endian unsigned 48-bit long —
    * bit-identical to `conv(substring(md5(x), 1, 12), 16, 10)`.
    */
  def hash48(b: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(b)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}

/** Native form of the engine's universal string hash
  * `conv(substring(md5(x), 1, 12), 16, 10)::long` (Dedup.md5Hash48).
  * The composed formulation materializes a 32-char hex UTF8String per
  * value and re-parses 12 chars of it base-16 — pure allocation on the
  * hottest path in the library (every shingle/span/token hash in the
  * dedup, text, and contamination families goes through it). This
  * expression goes digest-bytes → long with no intermediate string,
  * inside whole-stage codegen.
  *
  * Value-identical to the composed form (first 6 MD5 bytes, big-endian
  * unsigned), so every DuckDB oracle mirroring
  * `('0x' || substr(md5(x), 1, 12))::BIGINT` is unchanged —
  * ExtensionsSpec pins the equality on real data.
  */
case class Md5Hash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5h48 needs a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.hash48(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.hash48($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash48 =
    copy(child = newChild)
}
