package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *     baseline. The query side is broadcast (queries are few), so the
  *     corpus is scanned once with no shuffle of the big side; the
  *     top-k is a per-query window over candidate rows.
  *   - [[signLshTopK]]: random-hyperplane (sign) LSH — the scale path.
  *     Corpus and queries are bucketed by an `nBits`-bit signature;
  *     only same-bucket pairs are scored. At 100 TB the bucket join is
  *     a hash shuffle on a short int key instead of a cross join.
  *
  * All arithmetic is Column-only (codegen'd): dot products via
  * zip_with + aggregate in double precision, hyperplanes burned in as
  * literals from a seeded RNG so results are deterministic.
  */
object Ann {

  // codegen'd vector kernel (graft.functions.DotProduct) — the
  // interpreted zip_with/aggregate formulation was ~20× slower on the
  // O(n²·d) scan; float inputs are widened in-loop, so results are
  // bit-identical to the double fold. The norm staging is the
  // per-ROW guard point: scoringNorm is NULL for a vector with any
  // NULL/NaN/±Inf element, so every cosine against it is NULL and the
  // pair is dropped pre-rank — per-row cost, never per-pair.
  private def norm(v: Column): Column = graft.functions.VectorExprs.scoringNorm(v)
  private def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)
  // NULL (not DIVIDE_BY_ZERO — ANSI throws) for a zero-magnitude
  // vector; NULL sorts last under the desc rank windows below, so a
  // zero vector simply never reaches a top-k. See
  // VectorExprs.cosineWithNorms for the full rationale.
  private def cosine(qv: Column, cv: Column, qn: Column, cn: Column): Column =
    graft.functions.VectorExprs.cosineWithNorms(qv, cv, qn, cn)

  /** Exact cosine top-k: for each query row, the k nearest corpus rows
    * (excluding itself when ids collide). Output: query_id, rank,
    * neighbor_id, cosine.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
      // unscoreable pairs (zero-magnitude / NaN / length-mismatched →
      // NULL cosine) are DROPPED, not ranked: a NULL would only ever
      // pad a top-k when fewer than k scoreable candidates exist, and
      // a padded junk row is worse than a short result. Same contract
      // in every ranking tail below (r12 chaos-parity drive).
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic "first ids" quantizer seeds, SCREENED: the shared
    * collect behind the gate queries' fixed quantizers (sim03 IVF
    * centroids, sim06/sim07 PQ codebook bases, dd12 semantic-dedup
    * cells). The shape/finiteness screen runs BEFORE the id cut —
    * one corrupt low-id vector would otherwise become a NaN/−Inf
    * centroid that reorders every cell assignment (r12 chaos-parity
    * review find) — and the screen width is ELECTED from the data
    * (dominantDim), mirroring the oracles' screened cent CTEs. One
    * helper so the seed contract lives in one place.
    */
  def screenedSeedVectors(emb: DataFrame, idCol: String, vecCol: String,
      maxId: Long): Seq[Seq[Double]] = {
    val dim = graft.functions.VectorExprs.dominantDim(emb, vecCol)
    emb.filter(graft.functions.VectorExprs.isShapedVec(col(vecCol), dim))
      .filter(col(idCol) < maxId)
      .orderBy(col(idCol)).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
  }

  /** Deterministic random hyperplanes: nBits × dim doubles in [-1, 1).
    * nBits is capped at 31 because [[signature]] packs one bit per plane
    * into a positive Int.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    require(nBits >= 1 && nBits <= 31,
      s"nBits must be in [1, 31] (bits pack into an Int), got $nBits")
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Sign-LSH bucket id: bit i = [v · h_i > 0], packed into an int. */
  def signature(v: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.size <= 31,
      s"at most 31 hyperplanes pack into an Int signature, got ${planes.size}")
    planes.zipWithIndex.map { case (p, i) =>
      val lp = array(p.map(lit): _*)
      when(dot(v, lp) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Per-row (dist-to-centroid, cell) structs: Euclidean order without
    * the |v|² term (constant per row): dist' = |c|² − 2·v·c. |c|² is a
    * sequential index-order fold, matching DuckDB's
    * list_dot_product(c, c) bit-for-bit (the sim02-proven parity).
    */
  private def centroidDists(v: Column, centroids: Seq[(Seq[Double], Int)]): Seq[Column] =
    centroids.map { case (c, i) =>
      val lc = array(c.map(lit): _*)
      val cNormSq = c.map(x => x * x).sum
      struct((lit(cNormSq) - lit(2.0) * dot(v, lc)).as("dist"), lit(i).as("cell"))
    }

  /** Nearest-centroid assignment as a `(dist, cell)` struct Column —
    * the same literal arithmetic [[ivfTopKFixed]] assigns cells by
    * (Euclidean order without the constant |v|² term; ties break on
    * cell index via the struct sort). Shared with Dedup.semanticDedup
    * so cluster assignment is one oracle-checkable comparator
    * everywhere it appears.
    */
  def nearestCell(v: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(array_sort(array(centroidDists(v, centroids.zipWithIndex): _*)), 1)

  /** The `nProbe` nearest centroid indices as an int array Column —
    * the multi-cell generalization of [[nearestCell]], shared by the
    * IVF probe side and its compositions.
    */
  def cellProbes(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    transform(
      slice(array_sort(array(centroidDists(v, centroids.zipWithIndex): _*)), 1, nProbe),
      p => p.getField("cell"))

  /** Shared IVF probe+score tail: corpus rows carry an assigned cell;
    * each query explodes into its nProbe nearest cells (broadcast), and
    * only same-cell pairs are scored.
    */
  private def probeAndScore(cells: DataFrame, queries: DataFrame,
      centroids: Seq[(Seq[Double], Int)], nProbe: Int, k: Int): DataFrame = {
    val qProbed = queries
      .withColumn("probes",
        slice(array_sort(array(centroidDists(col("qv"), centroids): _*)), 1, nProbe))
      .withColumn("cell", explode(transform(col("probes"), p => p.getField("cell"))))
      .drop("probes")
    val scored = cells.join(broadcast(qProbed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
      .filter(col("cosine").isNotNull) // bruteForceTopK's drop contract
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF-style top-k: a k-means coarse quantizer (MLlib, seeded)
    * partitions the corpus into nLists cells; each query probes its
    * nProbe nearest centroids and scores only those cells. The second
    * classic ANN scale path next to sign-LSH: at 100 TB the corpus is
    * scanned once to assign cells (one shuffle on cell id), queries
    * broadcast, and per-query work is corpus/nLists × nProbe.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // the index holds FINITE, RIGHT-SHAPED vectors only: one NaN/Inf
    // embedding (failed decode) would smear NaN into its centroid at
    // fit time AND crash MLlib's cell-assignment UDF at transform time
    // (requirement failure on a NaN norm), and a truncated vector (r11
    // chaos shard) fails KMeans' dimension requirement — a poisoned
    // row is unindexable, same exclusion contract as MlPipeline.pcaEmbed
    val dim = graft.functions.VectorExprs.dominantDim(corpus, vecCol)
    val corpusVec = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(graft.functions.VectorExprs.isShapedVec(col("cv"), dim))
      .withColumn("feat",
        array_to_vector(transform(col("cv"), x => x.cast("double"))))
    // the coarse quantizer only places probe cells — a handful of
    // Lloyd iterations is plenty (recall is governed by nProbe/nLists,
    // not quantizer convergence), and it halves index build time
    val km = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("feat")
      .setPredictionCol("cell").setMaxIter(8)
    val model = km.fit(corpusVec)
    val cells = model.transform(corpusVec)
      .select(col("neighbor_id"), col("cv"), col("cell"))
      .withColumn("cn", norm(col("cv")))
    // probe cells rank by Euclidean distance — the same metric the
    // k-means quantizer assigns cells by: dist² = |q|² − 2·q·c + |c|²,
    // and |q|² is constant per query, so |c|² − 2·q·c orders identically
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (c.toArray.toSeq, i) }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    probeAndScore(cells, q, centroids, nProbe, k)
  }

  /** IVF top-k with CALLER-SUPPLIED centroids — the correctness-gate
    * variant (VERDICT r4 item 6): KMeans.fit isn't reproducible in an
    * SQL oracle, but with fixed centroids both cell assignment and
    * probing are literal arithmetic. Also the real-world shape for a
    * pre-trained/externally-owned quantizer, which is how IVF indexes
    * are deployed anyway (train once, assign forever).
    */
  def ivfTopKFixed(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Seq[Seq[Double]], nProbe: Int = 4): DataFrame = {
    graft.functions.VectorExprs.validateCentroids(centroids, "ivfTopKFixed")
    val indexed = centroids.zipWithIndex
    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", nearestCell(col("cv"), centroids).getField("cell"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    probeAndScore(cells, q, indexed, nProbe, k)
  }

  /** Scalar int8 quantization + exact integer-dot ranking — the memory
    * (and network) side of the ANN trade: 4× smaller vectors than
    * float32, and because quantized dots are small exact integers the
    * ranking is fully reproducible across engines, partitionings and
    * runs (float cosine ties near a top-k cut are not — the sim01
    * lesson). One corpus pass computes the global symmetric scale
    * (127 / max |x|), quantization is a codegen'd projection, and the
    * scoring join broadcasts the (few) queries like [[bruteForceTopK]].
    * Combine with [[signLshTopK]] bucketing for the full 100 TB path:
    * bucket on the signature, score on the int8 codes.
    *
    * Every product ≤ 127² and dim ≤ 2^30, so dots stay far inside
    * double's exact-integer range — the float kernel's double fold is
    * bit-exact, and casting to long loses nothing.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dimHint: Int = -1): DataFrame = {
    // Shape/finiteness screen on BOTH sides (r12 chaos-parity drive):
    // the scale below is a GLOBAL max — one NaN element in one corpus
    // row made it NaN (Spark's max orders NaN above every number), so
    // every quantized code went NaN and the whole ranking silently
    // collapsed to zeros. Corrupt rows are unquantizable, same
    // exclusion contract as the PQ/IVF/Hamming index fits. dimHint
    // skips the election job when the caller knows the width
    // (signLshTopK's composed-pipeline escape hatch).
    val dim = if (dimHint > 0) dimHint
      else graft.functions.VectorExprs.dominantDim(corpus, vecCol)
    val corpusC = corpus.filter(graft.functions.VectorExprs.isShapedVec(col(vecCol), dim))
    val queriesC = queries.filter(graft.functions.VectorExprs.isShapedVec(col(vecCol), dim))
    // The global max-|x| rides along as a broadcast scalar (the mx07
    // totals pattern) instead of a separate driver first() job — the
    // composed path stays one plan, and ReuseExchange shares the
    // corpus aggregate between the two crossJoins. An all-zero corpus
    // raises in-plan rather than via a driver require.
    val mx = corpusC
      .agg(max(array_max(transform(col(vecCol), x => abs(x))))
        .cast("double").as("__maxabs"))
    val scale = when(col("__maxabs") > 0d, lit(127.0) / col("__maxabs"))
      .otherwise(raise_error(lit("quantization scale undefined: all-zero corpus")))
    // floor(x·s + ½): explicit half-up rounding — identical in every
    // engine, unlike round()'s dialect-dependent tie rules
    def quant(v: Column): Column =
      transform(v, x => floor(x.cast("double") * scale + lit(0.5)).cast("float"))
    val c = corpusC.crossJoin(broadcast(mx))
      .select(col(idCol).as("neighbor_id"), quant(col(vecCol)).as("qc"))
    val q = queriesC.crossJoin(broadcast(mx))
      .select(col(idCol).as("query_id"), quant(col(vecCol)).as("qq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("qq"), col("qc")).cast("long").as("qdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("qdot"))
  }

  /** Hard-negative mining for contrastive training: per query, the k
    * nearest neighbors whose label DIFFERS from the query's — the
    * batch-construction step of embedding-model training data (the
    * same-label nearest neighbors are the positives; the closest
    * OTHER-label vectors are the hardest negatives). Same shape and
    * cost as [[bruteForceTopK]]: queries broadcast, the label
    * inequality rides the join condition so non-candidates never
    * reach the window. At corpus scale, compose with [[ivfTopKFixed]]
    * cells or [[signLshTopK]] buckets exactly like plain top-k.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("neg_label")).withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label")).withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("q_label") =!= col("neg_label"))
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
      .filter(col("cosine").isNotNull) // bruteForceTopK's drop contract
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neg_label"), col("cosine"))
  }

  /** LSH-bucketed top-k: score only same-signature pairs. Recall < 1 by
    * construction (tested against [[bruteForceTopK]] in AnnSpec);
    * raising nBits shrinks buckets, lowering it raises recall.
    */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 8,
      seed: Long = 42L, dimHint: Int = -1): DataFrame = {
    // dimHint avoids the extra driver-side probe job when the caller
    // already knows the embedding width (VERDICT r4: composed pipelines
    // shouldn't pay a first() per call). Without a hint the width is
    // ELECTED (dominantDim), not read off an arbitrary first row — a
    // truncated first row would have sized the hyperplanes to the
    // corruption and screened out the healthy majority (r12 review).
    val dim = if (dimHint > 0) dimHint
      else graft.functions.VectorExprs.dominantDim(corpus, vecCol)
    val planes = hyperplanes(nBits, dim, seed)
    // shape screen both sides, like hammingTopK: a truncated vector's
    // prefix signature would bucket it as if whole (r12 chaos parity)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(graft.functions.VectorExprs.isShapedVec(col("cv"), dim))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", signature(col("cv"), planes))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(graft.functions.VectorExprs.isShapedVec(col("qv"), dim))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket", signature(col("qv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
      .filter(col("cosine").isNotNull) // bruteForceTopK's drop contract
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Product-quantization top-k (Jégou et al. 2011, the FAISS IVFPQ
    * building block): the vector splits into `m` subspaces, each
    * encoded as its nearest subspace-codebook centroid — m small ints
    * instead of dim floats, the memory scheme that makes billion-vector
    * indexes fit a cluster. Scoring is asymmetric (ADC): the EXACT
    * query against each corpus vector's reconstruction (the
    * concatenation of its chosen centroids), ranked by approximate
    * cosine with the reconstruction's own norm.
    *
    * Caller supplies the codebooks (`codebooks(j)(i)` = centroid i of
    * subspace j) — like [[ivfTopKFixed]], the deployed shape (train
    * once, assign forever) and the reason the whole path is literal
    * arithmetic an SQL oracle reproduces: encoding reuses the
    * |c|² − 2·v·c comparator per subspace, reconstruction is a CASE
    * over centroid literals.
    *
    * Scale: encoding is codegen'd projection on the corpus scan (no
    * shuffle); queries broadcast; per-pair work is one dim-length dot
    * against the reconstruction. At deployment the codes (m bytes) are
    * what's stored and shipped — the 4-32× compression is the point;
    * compose with IVF cells to avoid the full scan.
    */
  /** Shared PQ encode + reconstruct: per-subspace nearest-centroid
    * codes, then the reconstruction `rv` (concatenated chosen-centroid
    * literals via a CASE per subspace) with its norm `rn`. Output keeps
    * the code columns — at deployment THOSE are what a store persists.
    */
  private def pqEncodeRecon(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(codebooks.nonEmpty, "pqEncodeRecon: empty codebook set")
    codebooks.zipWithIndex.foreach { case (cb, j) =>
      graft.functions.VectorExprs.validateCentroids(cb, s"pqEncodeRecon codebook $j")
    }
    val m = codebooks.size
    val subDim = codebooks.head.head.size
    require(codebooks.forall(_.forall(_.size == subDim)),
      "all codebook centroids must share the subspace dimension")
    // slice() silently clamps short subvectors, so a vector whose size
    // disagrees with the codebooks' m·subDim would MIS-ENCODE instead
    // of failing. Through r10 this was an in-plan assert_true — but a
    // corpus-wide abort on ONE truncated vector is the wrong tradeoff
    // at 100 TB (r11 chaos shard): mismatched rows are unindexable and
    // are SCREENED like every other fit (finiteness included — a NaN
    // element would otherwise win every nearest-centroid comparison).
    // A codebook/corpus CONFIG mismatch still surfaces loudly: every
    // row screens out and the index is visibly empty.
    var enc = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(graft.functions.VectorExprs.isShapedVec(col("cv"), m * subDim))
    for (j <- 0 until m) {
      val sub = slice(col("cv"), j * subDim + 1, subDim)
      enc = enc.withColumn(s"code_$j", nearestCell(sub, codebooks(j)).getField("cell"))
    }
    val recon = concat((0 until m).map { j =>
      val first = when(col(s"code_$j") === 0, array(codebooks(j)(0).map(lit): _*))
      codebooks(j).zipWithIndex.tail.foldLeft(first) { case (acc, (c, i)) =>
        acc.when(col(s"code_$j") === i, array(c.map(lit): _*))
      }
    }: _*)
    enc.withColumn("rv", recon).withColumn("rn", norm(col("rv")))
  }

  /** Shared ADC scoring tail: approximate cosine of the exact query
    * against each candidate's reconstruction, top-k per query. */
  private def adcRank(candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    candidates
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("rv"), col("qn"), col("rn")).as("score"))
      .filter(col("score").isNotNull) // bruteForceTopK's drop contract
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val cells = pqEncodeRecon(corpus, idCol, vecCol, codebooks)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    adcRank(cells.join(broadcast(q), col("query_id") =!= col("neighbor_id")), k)
  }

  /** IVF + PQ composed (the FAISS IVFADC shape, non-residual variant):
    * the coarse quantizer bounds WHICH vectors are scored (nProbe
    * cells per query instead of the full corpus), PQ codes bound WHAT
    * is stored and scored (m small ints per vector). Both quantizers
    * are caller-supplied → the whole path stays literal arithmetic
    * with a generated SQL oracle, like its two parents. The classic
    * refinement (encode residuals v − coarse_centroid instead of raw
    * vectors) composes the same way; raw-vector codes keep codebooks
    * shareable across cells.
    *
    * Scale: one corpus scan does coarse assignment + PQ encoding
    * (codegen'd projections, no shuffle); the scoring join hashes on
    * cell id with the probed queries broadcast — per-query work is
    * corpus/nLists × nProbe dim-length dots against reconstructions.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, coarse: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      nProbe: Int = 4): DataFrame = {
    graft.functions.VectorExprs.validateCentroids(coarse, "ivfPqTopK coarse")
    val cells = pqEncodeRecon(corpus, idCol, vecCol, codebooks)
      .withColumn("cell", nearestCell(col("cv"), coarse).getField("cell"))
    val qProbed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("cell", explode(cellProbes(col("qv"), coarse, nProbe)))
    adcRank(cells.join(broadcast(qProbed), Seq("cell")), k)
  }

  /** Pack 32 sign bits of `v` (1-based dims lo..lo+31) into a long:
    * bit (i − lo) set iff v[i] > 0. Two calls cover a 64-dim vector
    * without touching the long's sign bit.
    */
  private def packSignBits(v: Column, lo: Int): Column =
    aggregate(
      sequence(lit(lo), lit(lo + 31)),
      lit(0L),
      (acc, i) => acc.bitwiseOR(
        when(element_at(v, i.cast("int")) > 0,
          call_function("shiftleft", lit(1L), (i - lit(lo)).cast("int")))
          .otherwise(lit(0L))))

  /** Binary-embedding search: 64-dim vectors binarized to their sign
    * bits (two 32-bit words in longs — 8 bytes/vector, the most
    * compressed ANN representation) and ranked by Hamming distance via
    * xor + popcount. Everything is small-integer arithmetic, so the
    * ranking is exactly reproducible across engines — no float ties at
    * the cut, the same property as the int8 path (sim04), at 32×
    * smaller storage than float32.
    *
    * Scale: binarization is a codegen'd projection on the scan;
    * queries broadcast; per-pair cost is two xor+popcount ops —
    * binary pre-ranking is the classic cheap first stage before exact
    * or PQ re-ranking.
    */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // shape screen (r11): packSignBits element_at's dims 1..64, so a
    // truncated vector is an ANSI INVALID_ARRAY_INDEX that kills the
    // whole ranking — corrupt rows are unindexable (and an unrankable
    // QUERY vector returns no rows for that query), same contract as
    // the other index fits
    def sigs(df: DataFrame, id: String) = df
      .filter(graft.functions.VectorExprs.isShapedVec(col(vecCol), 64))
      .select(col(idCol).as(id),
        packSignBits(col(vecCol), 1).as(s"${id}_h1"),
        packSignBits(col(vecCol), 33).as(s"${id}_h2"))
    val c = sigs(corpus, "neighbor_id")
    val q = sigs(queries, "query_id")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (bit_count(col("neighbor_id_h1").bitwiseXOR(col("query_id_h1"))) +
          bit_count(col("neighbor_id_h2").bitwiseXOR(col("query_id_h2"))))
          .cast("int").as("hamming"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("hamming"))
  }

  /** Two-stage retrieval (the production search cascade): binary
    * Hamming pre-ranking prunes the corpus to `preK` candidates per
    * query at 8 bytes/vector, then exact cosine re-ranks only those
    * survivors to the final `k`. Recall is governed by preK/k — the
    * standard accuracy-vs-cost dial — while the expensive float dots
    * touch preK rows per query instead of the corpus.
    *
    * Both stages are already oracle-checked operators (sim08/sim01
    * semantics); the composition stays exactly reproducible because
    * stage 1's cut is integer-ranked.
    */
  def rerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, preK: Int): DataFrame = {
    val cand = hammingTopK(corpus, queries, idCol, vecCol, preK)
      .select(col("query_id"), col("neighbor_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = cand.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
      .filter(col("cosine").isNotNull) // bruteForceTopK's drop contract
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
