package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The `GRAPH <hops> '<start>'` statement over the TOPOLOGY graph —
  * reference `engine/executor/graph_transform.go:137` (Work): the graph
  * arrives as ONE JSON document from the topo service, or the built-in
  * fallback topology when none is configured
  * (`engine/executor/graph.go:426` mockGetTimeGraph — shipped here as
  * the `graft/graph_topology.json` resource, the same data). The
  * traversal is `graph.go:168` MultiHopFilter: an undirected level-BFS
  * from the start node, `hopNum` levels, collecting the sub-graph's
  * nodes and traversed edges.
  *
  * The document is driver-resident by design — the reference holds the
  * whole topology in one process too (it is service metadata, not
  * series data); the resulting frame is a small dimension any join
  * against it broadcasts.
  *
  * Output: one row per sub-graph node then per edge, columns
  * `(time=0, uid, metadata)` — the reference's GraphToRows
  * `[Uid, MetaData]` shape (`graph.go:407`) with a zero time axis so
  * the frame serves as a CTE measurement (`WITH t1 AS (GRAPH 3 'ELB')
  * … uid IN (SELECT uid FROM t1)`, server_test.go
  * Push_Down_Rule_Incondition). */
object GraphTopology {

  private case class Node(uid: String, metaJson: String)
  private case class Edge(uid: String, src: String, dst: String,
                          metaJson: String)

  private lazy val (nodes, edges): (Seq[Node], Seq[Edge]) = {
    val in = getClass.getResourceAsStream("/graft/graph_topology.json")
    require(in != null, "graph_topology.json missing")
    val txt = new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val j = JsonMethods.parse(txt)
    def str(v: JValue): String = v.asInstanceOf[JString].s
    val ns = (j \ "vertex").asInstanceOf[JArray].arr.map { v =>
      Node(str(v \ "uid"),
        JsonMethods.compact(JsonMethods.render(v \ "metadata")))
    }
    val es = (j \ "edges").asInstanceOf[JArray].arr.map { e =>
      Edge(str(e \ "uid"),
        str(e \ "metadata" \ "sourceUid"),
        str(e \ "metadata" \ "targetUid"),
        JsonMethods.compact(JsonMethods.render(e \ "metadata")))
    }
    (ns, es)
  }

  /** Level-BFS sub-graph (MultiHopFilter, graph.go:168): nodes within
    * `hopNum` hops of `start` plus every traversed edge. */
  def frame(spark: SparkSession, start: String, hopNum: Int): DataFrame = {
    require(nodes.exists(_.uid == start),
      s"MultiHopFilter startNodeId not found $start")
    val bySrc = edges.groupBy(_.src)
    val byDst = edges.groupBy(_.dst)
    val visited = scala.collection.mutable.LinkedHashSet[String](start)
    val keptEdges = scala.collection.mutable.LinkedHashSet[String]()
    var frontier = Seq(start)
    var hops = hopNum
    while (frontier.nonEmpty && hops > 0) {
      val next = Seq.newBuilder[String]
      frontier.foreach { cur =>
        (bySrc.getOrElse(cur, Nil) ++ byDst.getOrElse(cur, Nil))
          .foreach { e =>
            keptEdges += e.uid
            val other = if (e.src == cur) e.dst else e.src
            if (visited.add(other)) next += other
          }
      }
      frontier = next.result()
      hops -= 1
    }
    import spark.implicits._
    val rows =
      nodes.filter(n => visited.contains(n.uid))
        .map(n => (0L, n.uid, n.metaJson)) ++
      edges.filter(e => keptEdges.contains(e.uid))
        .map(e => (0L, e.uid, e.metaJson))
    rows.toDF("time", "uid", "metadata")
  }
}
