package graft

import org.apache.spark.sql.functions._

/** Round-7 ninth wave: BFS distances satisfy the shortest-path
  * triangle inequality and have converged within the unrolled rounds.
  */
class Extended13Spec extends SparkSpec {

  test("q98 BFS: source at 0, bounded depth, edge-relaxed fixed point") {
    val dist = queries.Catalog.queries("q98_bfs_sssp")(spark, Sf0001)
      .localCheckpoint()
    val d = dist.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(1L) == 0)
    assert(d.values.forall(v => v >= 0 && v <= 4))
    // relaxation fixed point on REACHED nodes: for every edge (u,v)
    // with both ends reached, |d(u) − d(v)| ≤ 1 — if a 5th round could
    // improve anything, some edge would violate this
    val li = Tables.lineitem(spark, Sf0001)
      .filter(col("l_suppkey") < 100)
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (u, v) =>
      (d.get(u), d.get(v)) match {
        case (Some(du), Some(dv)) =>
          assert(math.abs(du - dv) <= 1, s"edge ($u,$v): $du vs $dv")
        case (Some(du), None) =>
          // v unreached but a reached neighbor at du would reach it at
          // du+1 ≤ 4 — only legal if du+1 > 4
          assert(du + 1 > 4, s"node $v unreached despite neighbor at $du")
        case (None, Some(dv)) =>
          assert(dv + 1 > 4, s"node $u unreached despite neighbor at $dv")
        case _ => ()
      }
    }
  }
}
