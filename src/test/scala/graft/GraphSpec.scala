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

  test("edge and node conditions restrict traversal (GraphStatement)") {
    import org.apache.spark.sql.functions._
    // 1→2→3, 1→4→3 where edge 1→2 is "slow" and node 4 is "down"
    val edges = Seq((1L, 2L, "fast"), (2L, 3L, "fast"), (1L, 4L, "fast"),
      (4L, 3L, "fast"), (1L, 2L, "slow"))
      .toDF("src", "dst", "kind")
    val nodes = Seq((1L, "up"), (2L, "up"), (3L, "up"), (4L, "down"))
      .toDF("node_id", "status")
    // no conditions: everything reachable
    val all = Graph.hopsFiltered(edges, 1L, 3)
      .as[(Long, Int)].collect().toMap
    assert(all == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
    // node condition: 4 is down, so 3 is only reachable via 2
    val up = Graph.hopsFiltered(edges, 1L, 3,
      nodes = Some((nodes, col("status") === "up")))
      .as[(Long, Int)].collect().toMap
    assert(up == Map(1L -> 0, 2L -> 1, 3L -> 2))
    // edge + node conditions: only fast edges between up nodes
    val both = Graph.hopsFiltered(edges, 1L, 3,
      edgeCond = Some(col("kind") === "fast"),
      nodes = Some((nodes, col("status") === "up")))
      .as[(Long, Int)].collect().toMap
    assert(both == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("undirected=true equals manual symmetrization, in every tier") {
    val e0 = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val sym = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    val want = Graph.hops(sym, 1L, 2).as[(Long, Int)].collect().toSet
    assert(want == Set((1L, 0), (2L, 1), (4L, 1), (3L, 2)))
    assert(Graph.hops(e0, 1L, 2, undirected = true)
      .as[(Long, Int)].collect().toSet == want)
    try {
      sys.props("graft.graph.maxResidentBytes") = "0"
      assert(Graph.hops(e0, 1L, 2, undirected = true)
        .as[(Long, Int)].collect().toSet == want)
      assert(Graph.hops(e0, 1L, 2, maxDriverFrontier = 1, undirected = true)
        .as[(Long, Int)].collect().toSet == want)
    } finally sys.props -= "graft.graph.maxResidentBytes"
  }

  test("all three tiers agree: resident, driver-frontier, distributed") {
    // random-ish graph with a cycle, a chain, and fan-out
    val edges = (1L to 200L).flatMap { i =>
      Seq((i, i % 97 + 1), (i, (i * 7) % 193 + 1))
    }.toDF("src", "dst")
    def run(): Set[(Long, Int)] =
      Graph.hops(edges, 5L, 4, maxDriverFrontier = 3)
        .as[(Long, Int)].collect().toSet
    val resident = Graph.hops(edges, 5L, 4)
      .as[(Long, Int)].collect().toSet
    val forced = try {
      sys.props("graft.graph.maxResidentBytes") = "0"
      // maxDriverFrontier = 3 forces the distributed fallback mid-BFS;
      // default cap exercises the pure driver-frontier tier
      val distributed = run()
      val frontier = Graph.hops(edges, 5L, 4).as[(Long, Int)].collect().toSet
      (distributed, frontier)
    } finally sys.props -= "graft.graph.maxResidentBytes"
    assert(forced._1 == resident)
    assert(forced._2 == resident)
    assert(resident.count(_._2 == 0) == 1)
  }
}
