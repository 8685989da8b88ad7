package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Pure-Scala replay of the same simplified-PageRank recurrence, for
    * checking the distributed implementation against.
    */
  private def rankRef(edges: Seq[(String, String)], iters: Int, d: Double): Map[String, Double] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val outDeg = e.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val incoming = e.groupBy(_._2).view.mapValues(in =>
        in.map { case (u, _) => r(u) / outDeg(u) }.sum).toMap
      // mirror the operator's per-iteration 8-decimal snap (see
      // Graph.pageRank — it pins cross-engine state reproducibility)
      r = nodes.map(n => n ->
        math.round(((1.0 - d) + d * incoming.getOrElse(n, 0.0)) * 1e8) / 1e8).toMap
    }
    r
  }

  test("pageRank matches the scalar recurrence on a known graph") {
    // a→b, b→a, a→c, c dangling: c receives but never emits
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 10, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val want = rankRef(edges, 10, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (n, r) =>
      assert(math.abs(r - want(n)) < 1e-9, s"node $n: $r vs ${want(n)}")
    }
    // sanity: the mutually-linked hub outranks the dangling sink
    assert(got("a") > got("c"))
  }

  test("pageRank: duplicate edges collapse, ranks stay positive and bounded") {
    val edges = Seq(("x", "y"), ("x", "y"), ("y", "x"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 5, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val want = rankRef(Seq(("x", "y"), ("y", "x")), 5, 0.85)
    got.foreach { case (n, r) =>
      assert(math.abs(r - want(n)) < 1e-9)
      assert(r > 0.0 && r < 10.0)
    }
  }
}
