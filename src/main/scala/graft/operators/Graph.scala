package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Hop-bounded graph traversal — the reference's experimental GRAPH
  * statement (`influxql/ast.go:12282` `GraphStatement{NodeCondition,
  * EdgeCondition, HopNum, StartNodeId}`, `DataType Graph = 11` at
  * `ast.go:78`), which answers "which nodes are reachable from the start
  * node within N hops, and at what minimum distance".
  *
  * Spark-first shape: breadth-first expansion as `HopNum` shuffle joins
  * over the (src, dst) edge frame. Each hop joins only the FRONTIER
  * (nodes first reached last hop) against the edges and anti-joins the
  * visited set, so per-hop work is proportional to the frontier, not the
  * paths — path-counting blowup (the naive recursive-CTE plan) never
  * happens. `HopNum` is a small user constant in the reference, so the
  * driver-side loop is bounded; each iteration is fully distributed, and
  * the frontier is checkpoint-truncated so plan depth stays constant.
  * At cluster scale the edge frame would be pre-bucketed by `src` to
  * make every hop a co-located join.
  */
object Graph {

  /** Nodes within `hopNum` hops of `start`, with their minimum hop
    * distance: (node_id, hop), hop 0 = the start node itself.
    * `edges` must have `src`/`dst` columns; for an undirected graph
    * pass the symmetrized frame. */
  def hops(edges: DataFrame, start: Long, hopNum: Int): DataFrame = {
    require(hopNum >= 0 && hopNum <= 16, s"hopNum out of range: $hopNum")
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the edge frame once: every hop joins it, and without
    // this each iteration re-derives the whole edge pipeline (scan +
    // distinct + union). At cluster scale this is persist-to-disk of a
    // src-bucketed edge table.
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    var visited = Seq((start, 0)).toDF("node_id", "hop")
    var frontier = visited
    var h = 0
    while (h < hopNum && !frontier.isEmpty) {
      h += 1
      val next = frontier.join(e, frontier("node_id") === e("src"))
        .select(e("dst").as("node_id")).distinct()
        .join(visited, Seq("node_id"), "left_anti")
        .withColumn("hop", lit(h))
        // truncate lineage: hop h's plan must not re-derive hops 1..h-1
        .localCheckpoint(true)
      visited = visited.union(next).localCheckpoint(true)
      frontier = next
    }
    visited
  }
}
