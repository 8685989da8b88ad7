package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Native Catalyst expression for the ANN/dedup hot path.
  *
  * `zip_with` + `aggregate` are HigherOrderFunctions — they evaluate
  * interpreted (no whole-stage codegen), which made the O(n²·d)
  * brute-force cosine scans ~20× slower than necessary. A BinaryExpression
  * with `doGenCode` keeps the dot product inside the generated loop:
  * one fused while-loop over the two ArrayData buffers, accumulating in
  * double (preference order (b) of SURVEY.md §7.3 / the build brief:
  * custom Expression before UDF).
  *
  * Accumulation is strictly sequential left-to-right, matching both the
  * previous fold formulation and DuckDB's list_cosine_similarity over
  * DOUBLE[] — the t2 oracle hash-compare depends on that bit-for-bit.
  * Float inputs are widened element-wise to double (exact).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0d
    var i = 0
    while (i < n) {
      val x: Double = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** v₁ · v₂ in double precision (codegen'd). */
  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))

  /** ‖v‖₂ via the same kernel. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** cos(a, b) with externally precomputed norms (stage them once per
    * side before a pair join — don't recompute per pair).
    *
    * NULL when either vector has zero magnitude: cosine is undefined
    * there, and under ANSI (Spark 4 default) a bare division would
    * THROW DIVIDE_BY_ZERO — one all-zero embedding (e.g. the hash
    * embedding of a token-less doc) in a 100 TB corpus would abort the
    * whole job. NULL instead never passes a `>= threshold` near-dup
    * filter and sorts LAST under a `desc` top-k ranking (Spark default
    * null ordering), so zero vectors are inert, not fatal.
    *
    * NaN is normalized to NULL for the same reason with the opposite
    * failure mode: a NaN ELEMENT in one embedding (failed decode,
    * upstream 0/0 — statistically certain at corpus scale) makes the
    * dot product NaN, and Spark orders NaN ABOVE every number — so one
    * poisoned vector would silently take rank 1 in EVERY query's
    * top-k and pass every similarity threshold (NaN >= t is true).
    * nanvl folds it into the same inert-NULL contract.
    *
    * NULL also for a LENGTH-MISMATCHED pair (r12 chaos-parity drive):
    * the [[DotProduct]] kernel is deliberately total — it folds over
    * min(len) rather than throwing — so without this guard a truncated
    * embedding (half-written shard) would be scored by a silent
    * PREFIX dot against full-length norms: a real-looking cosine that
    * can crack a top-k. Shape is part of validity (same contract as
    * [[isShapedVec]] at fit time); a mismatched pair is corruption and
    * goes inert, not ranked. Two array-length reads per pair — free
    * next to the O(d) dot.
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column = {
    import org.apache.spark.sql.functions.{lit, nanvl, nullif, size, when}
    when(size(a) === size(b),
      nanvl(dot(a, b) / nullif(normA * normB, lit(0.0)),
        lit(null).cast("double")))
  }

  /** TRUE iff every element of the vector is present (non-NULL) and
    * finite (no NaN, no ±Inf), and the vector itself is non-NULL.
    * `x * 0` is 0 for any finite x and NaN for both NaN and ±Inf, so
    * one isnan covers both bad classes; the explicit isNull arm is
    * NOT redundant — Spark's `isnan(NULL)` is FALSE (not NULL), so
    * without it a NULL element slipped every screen and the DotProduct
    * kernel read its slot as 0.0: a fabricated, real-looking score
    * (r12 chaos-parity review find). `exists` is a
    * HigherOrderFunction (interpreted, outside whole-stage codegen —
    * the same property that keeps HOFs off this engine's scoring hot
    * paths), which is fine HERE because this runs once per ROW (fit
    * screens, [[scoringNorm]] staging), never per candidate pair.
    * Rationale: one non-finite embedding (failed decode, upstream
    * 0/0) otherwise poisons a corpus-wide Gram matrix into all-NaN —
    * MLlib PCA's eigensolver then THROWS NotConvergedException (found
    * by the ChaosSmoke catalog sweep) and a k-means quantizer
    * silently degrades to NaN centroids.
    */
  def isFiniteVec(v: Column): Column = {
    import org.apache.spark.sql.functions.{exists, isnan, lit, not}
    v.isNotNull && not(exists(v, x => x.isNull || isnan(x * lit(0))))
  }

  /** ‖v‖₂ for SCORING-side staging: NULL — so every downstream cosine
    * is NULL and the pair is dropped pre-rank — unless the vector is
    * fully present and finite. Staged once per row next to the norm
    * it guards (linear, not per-pair), this closes the last scoring
    * hole: a NaN/±Inf element previously reached the cosine as NaN
    * (folded by nanvl), but a NULL element was read as 0.0 by the
    * kernel and produced a fabricated score no fold could catch.
    */
  def scoringNorm(v: Column): Column = {
    import org.apache.spark.sql.functions.when
    when(isFiniteVec(v), l2Norm(v))
  }

  /** TRUE iff the vector is finite AND has exactly `dim` elements.
    * Finiteness alone is not enough for a fit/index screen: parquet
    * arrays are variable-length, so a truncated or zero-length vector
    * (a half-written embedding shard) is schema-legal and — found by
    * the r11 chaos sweep — crashes MLlib PCA ("Dimensions mismatch
    * when adding new sample") and raw-array Gram loops
    * (IndexOutOfBounds) rather than degrading gracefully. Shape is
    * part of validity.
    */
  def isShapedVec(v: Column, dim: Int): Column = {
    import org.apache.spark.sql.functions.{lit, size}
    isFiniteVec(v) && size(v) === lit(dim)
  }

  /** Fail-fast validation for a CALLER-SUPPLIED quantizer (fixed
    * centroids, PQ codebooks): empty, ragged, or non-finite seeds are
    * config/bootstrap errors that must abort NAMED — a −Inf centroid
    * otherwise wins every nearest-cell comparison and silently
    * collapses the whole index into one cell, and a wrong width would
    * screen out the entire healthy corpus (r12 review). Shared by
    * semanticDedup and every Ann fixed-quantizer entry point.
    */
  def validateCentroids(centroids: Seq[Seq[Double]], who: String): Unit = {
    require(centroids.nonEmpty, s"$who: empty centroid set")
    require(centroids.forall(_.size == centroids.head.size),
      s"$who: ragged centroid widths " +
        centroids.map(_.size).distinct.sorted.mkString(","))
    require(centroids.forall(_.forall(x => !x.isNaN && !x.isInfinite)),
      s"$who: centroid with NaN/Inf element — screen the seed collect")
  }

  /** Modal share below which [[dominantDim]] warns (ADVICE r11): the
    * modal election is only trustworthy when the modal length clearly
    * IS the corpus's real dimensionality. A consistent shard-level
    * truncation hitting >50% of rows would elect the CORRUPT dim (and
    * the tie-break favors smaller, i.e. truncated, dims), silently
    * screening every healthy vector. Below this share the election is
    * ambiguous by construction, so it stays a pure function of the
    * data (no behavior change — hashes unchanged) but shouts.
    */
  val MinModalShare = 0.5

  /** The corpus's dominant (modal) vector length plus the share of
    * non-empty vectors holding that length — see [[dominantDim]] for
    * the election contract. Exposed separately so callers (and the
    * DegenerateInputSpec pin) can gate on the share directly.
    */
  def dominantDimWithShare(df: org.apache.spark.sql.DataFrame,
      vecCol: String): (Int, Double) = {
    import org.apache.spark.sql.functions.{col, count, lit, max, max_by, negate, size, struct, sum}
    // One aggregation over the (tiny) length histogram: the elected
    // dim via max_by over (n, -d) — largest count, ties to the SMALLER
    // dim — plus max(n) (the modal count: the elected group's count by
    // definition) and sum(n), so the share costs no extra corpus pass.
    val top = df.select(size(col(vecCol)).as("d")).filter(col("d") > 0)
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .agg(max_by(col("d"), struct(col("n"), negate(col("d")))).as("dim"),
        max(col("n")).as("modal_n"), sum(col("n")).as("total"))
      .head(1)
    // empty/all-corrupt corpus: a global agg over zero groups returns
    // one all-NULL row — fail with a NAMED cause; fitting an index
    // over nothing is a bootstrap/config error, and the one degenerate
    // regime where aborting loudly IS the contract
    require(top.nonEmpty && !top.head.isNullAt(0),
      s"dominantDim($vecCol): no non-empty vectors — cannot infer a fit dimensionality")
    val r = top.head
    (r.getInt(0), r.getLong(1).toDouble / r.getLong(2).toDouble)
  }

  /** The corpus's dominant (modal) vector length — the data-derived
    * `dim` for [[isShapedVec]] screens, so fits never hard-code a
    * dimensionality that testdata regeneration could drift away from.
    * One tiny aggregate at fit time (ties broken toward the smaller
    * dim, so the result is a pure function of the data). Zero-length
    * and NULL vectors don't vote: they are corruption by contract,
    * and an all-corrupt corpus should fail the fit loudly rather than
    * elect dim 0 and silently index nothing. When the modal dim holds
    * less than [[MinModalShare]] of the non-empty vectors, the
    * election still proceeds (deterministic, data-derived) but a loud
    * stderr warning names the dim and its share — a majority-corrupt
    * shard is detectable without changing any clean-data result.
    */
  def dominantDim(df: org.apache.spark.sql.DataFrame, vecCol: String): Int = {
    val (dim, share) = dominantDimWithShare(df, vecCol)
    if (share < MinModalShare) {
      // Double.toString, not an f-interpolator: %f is locale-dependent
      // (comma decimals under e.g. de_DE) and this line is asserted on
      val pct = math.round(share * 1000.0) / 10.0
      System.err.println(
        s"[graft] dominantDim($vecCol): modal dim $dim holds only $pct% " +
          "of non-empty vectors — election is ambiguous (majority-corrupt shard?); " +
          "healthy rows of other lengths will be screened out")
    }
    dim
  }
}
