package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality on DataFrames — the corpus-quality
  * propagation step of web-scale data curation (link-graph authority
  * scores feeding document quality weights).
  *
  * Scale posture: each iteration is one join (edges ⋈ ranks, both
  * partitioned on the source key) plus one map-side-combinable sum per
  * destination — the exact shape MapReduce/Pregel PageRank uses.
  * Lineage is cut per iteration with localCheckpoint so 10 iterations
  * don't build a 10-deep plan; the edge list and out-degrees are
  * materialized once and reused by every round. (localCheckpoint
  * trades executor-loss tolerance for speed — the stated posture in
  * SCALE.md "Ground rules", with reliable checkpoint() as the
  * cluster-mode escape hatch.)
  */
object Graph {

  /** Simplified (non-normalized) PageRank: rank₀ = 1, then
    * rankᵢ(v) = round((1 − d) + d · Σ_{(u,v)∈E} rankᵢ₋₁(u) / outdeg(u), 8)
    * for a FIXED iteration count — deterministic, so an engine-
    * independent oracle can replay it (unrolled per-iteration SQL).
    * Dangling nodes contribute nothing (their mass is not
    * redistributed), matching the common simplified formulation.
    *
    * The per-iteration 8-decimal snap makes the ITERATED state
    * engine-reproducible: partial-aggregation order shifts the
    * contribution sums by ~1e-15 per round, and unsnapped that drift
    * compounds until a 4-decimal output rounding can flip (observed
    * at sf0.001: five ranks off by the last printed digit vs the
    * oracle). Snapping far above the drift and far below the output
    * precision pins both engines to identical state every round.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // edges ⋈ outdeg is STATIC across iterations — materialize it once
    // (r19 optimization round, guide §2.4): the loop re-ran this join
    // inside every round, i.e. `iters` extra shuffles of the full edge
    // list at any scale; now each round joins only the (small) rank
    // frame against the pre-joined, already-partitioned edge table.
    val eo = e.join(outDeg, "src").localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (i <- 1 to iters) {
      val contribs = eo
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("incoming"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) + lit(damping) * coalesce(col("incoming"), lit(0.0)), 8)
            .as("rank"))
      // checkpoint every 3rd round, not every round: an eager
      // materialization job per iteration dominated wall-clock
      // (profiled ~0.4 s/round); a 3-iteration plan (9 joins) is still
      // comfortably within Catalyst's depth budget.
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
