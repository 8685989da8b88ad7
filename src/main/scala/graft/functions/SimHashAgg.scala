package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed SimHash aggregator: consumes one token hash per input row and
  * keeps per-bit vote counters in its buffer, so the fingerprint is a
  * single partial+final aggregation — no bits×tokens row explosion.
  * Semantics are identical to the explode formulation (±1 vote per
  * token occurrence per bit, bit set where votes > 0), which is what
  * the dd03 DuckDB oracle mirrors.
  *
  * This is the `Aggregator`/UDAF tier of the custom-operator
  * preference order (SURVEY.md §7.3): a mutable buffer aggregate that
  * MLlib-style built-ins can't express, still fully
  * partial-aggregatable (merge = vector add) so map-side combine
  * works at any scale.
  */
class SimHashAggregator(bits: Int) extends Aggregator[Long, Array[Long], Long] {
  require(bits > 0 && bits <= 63)

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], tokenHash: Long): Array[Long] = {
    var i = 0
    while (i < bits) {
      buf(i) += (if (((tokenHash >> i) & 1L) == 1L) 1L else -1L)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      if (buf(i) > 0) r |= (1L << i)
      i += 1
    }
    r
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimHashAgg {
  /** Column aggregate: simhash of the grouped token-hash column. */
  def simhash(tokenHash: Column, bits: Int = 48): Column =
    udaf(new SimHashAggregator(bits), Encoders.scalaLong).apply(tokenHash)
}
