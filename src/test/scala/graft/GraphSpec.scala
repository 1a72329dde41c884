package graft

import graft.operators.Graph

/** GRAPH statement hop traversal (`influxql/ast.go:12282`). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("BFS returns minimum hop distance and respects the hop bound") {
    // 1→2→3→4 chain, 9 isolated, 2→5 branch
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L))
      .toDF("src", "dst")
    val out = Graph.hops(edges, start = 1L, hopNum = 2)
      .as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 0), (2L, 1), (3L, 2), (5L, 2)))
  }

  test("cycles terminate and keep the first-visit hop") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val out = Graph.hops(edges, start = 1L, hopNum = 5)
      .as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 0), (2L, 1), (3L, 2)))
  }

  test("hop 0 is just the start node; empty frontier stops early") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    assert(Graph.hops(edges, 1L, 0).as[(Long, Int)].collect().toSet ==
      Set((1L, 0)))
    // node 7 has no out-edges: loop must stop at the empty frontier
    assert(Graph.hops(edges, 7L, 3).as[(Long, Int)].collect().toSet ==
      Set((7L, 0)))
  }
}
