package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Hop-bounded graph traversal — the reference's experimental GRAPH
  * statement (`influxql/ast.go:12282` `GraphStatement{NodeCondition,
  * EdgeCondition, HopNum, StartNodeId}`, `DataType Graph = 11` at
  * `ast.go:78`), which answers "which nodes are reachable from the start
  * node within N hops, and at what minimum distance".
  *
  * Spark-first shape, two tiers chosen per hop by frontier size:
  *
  * - **Driver frontier** (the normal case): BFS from ONE start node has
  *   frontiers that are tiny relative to the edge frame, so the frontier
  *   lives driver-side and each hop is a single distributed job —
  *   `edges.filter(src isin frontier)` (an `InSet` predicate that reaches
  *   the parquet scan, so row-group stats prune) + distinct + collect of
  *   the small dst set. No shuffle of the edge frame, no checkpoint, no
  *   broadcast build: one scan per hop. This is the Pregel "small
  *   frontier as shared state" optimization.
  * - **Distributed fallback**: past `maxDriverFrontier` nodes the hop
  *   switches to a join of the edge frame against the frontier/visited
  *   frames (broadcast while they fit, shuffle beyond), with
  *   `localCheckpoint` lineage truncation per level. Correctness is
  *   identical; on a real cluster the edge frame would be pre-bucketed
  *   by `src` to make every such hop a co-located join.
  */
object Graph {

  /** The full GRAPH statement surface (`ast.go:12282`): `EdgeCondition`
    * restricts which edges may be traversed, `NodeCondition` which
    * nodes — an edge is walkable only when it satisfies the edge
    * condition AND both endpoints are condition-satisfying nodes. The
    * start node is always reported (the reference anchors traversal at
    * StartNodeId regardless of conditions). Conditions are plain
    * Columns over the caller's edge/node frames; the node restriction
    * compiles to two semi-joins against the allowed-node set, which
    * AQE broadcasts while it is small — the edge frame never shuffles. */
  def hopsFiltered(edges: DataFrame, start: Long, hopNum: Int,
                   edgeCond: Option[org.apache.spark.sql.Column] = None,
                   nodes: Option[(DataFrame, org.apache.spark.sql.Column)] =
                     None,
                   maxDriverFrontier: Int = 1 << 17): DataFrame = {
    val e1 = edgeCond.map(edges.filter).getOrElse(edges)
    val e2 = nodes match {
      case Some((nodeDf, cond)) =>
        val allowed = nodeDf.filter(cond).select(col("node_id"))
        e1.join(allowed.withColumnRenamed("node_id", "src"),
            Seq("src"), "left_semi")
          .join(allowed.withColumnRenamed("node_id", "dst"),
            Seq("dst"), "left_semi")
      case None => e1
    }
    hops(e2, start, hopNum, maxDriverFrontier)
  }

  /** Nodes within `hopNum` hops of `start`, with their minimum hop
    * distance: (node_id, hop), hop 0 = the start node itself.
    * `edges` must have `src`/`dst` columns; for an undirected graph
    * pass the symmetrized frame. */
  def hops(edges: DataFrame, start: Long, hopNum: Int,
           maxDriverFrontier: Int = 1 << 17): DataFrame = {
    require(hopNum >= 0 && hopNum <= 16, s"hopNum out of range: $hopNum")
    val spark = edges.sparkSession
    import spark.implicits._
    // persist the edge frame across hops (Pregel-style): hop 1 pays the
    // scan + cache materialization, hops 2..N read executor memory (and
    // spill to disk, not recompute, under pressure) instead of re-running
    // the source scan per round. A caller that already persisted `edges`
    // (a resident graph, the reference's model — its graph feature keeps
    // the topology in memory across statements) owns the lifecycle: we
    // neither re-persist nor unpersist, so repeated traversals reuse one
    // materialization instead of paying scan+cache-build per query.
    val callerCached =
      edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val sel = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e = if (callerCached) sel
      else sel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // driver tier: visited map node -> hop, frontier as a plain array
    val visited = scala.collection.mutable.LongMap[Int](start -> 0)
    var frontier: Array[Long] = Array(start)
    var h = 0
    while (h < hopNum && frontier.nonEmpty &&
        frontier.length <= maxDriverFrontier &&
        visited.size <= maxDriverFrontier) {
      h += 1
      // map-side-only dedup (mapPartitions toSet): the hop stays ONE
      // narrow job — scan with the InSet predicate pushed down, no
      // shuffle stage — and the driver's visited map finishes the
      // dedup. Memory is the per-partition distinct dst count, the same
      // bound a map-side hash aggregate would use; cross-partition
      // duplicates inflate the collect by at most #partitions ×
      // |distinct dst|, which the driver-tier guard already bounds.
      // Frontier membership is ALWAYS a predicate, never a join: the
      // optimizer folds a >10-literal In into InSet (hash-set lookup,
      // O(1) expression nodes at runtime) and the predicate reaches
      // parquet row-group stats, so every hop stays ONE single-stage
      // job. The broadcast-join alternative costs an exchange that AQE
      // materializes as 1-2 extra scheduled jobs per hop — measured
      // 3x the scheduling floor on the bench's 3-hop queries.
      val matched =
        e.filter(col("src").isInCollection(frontier.toIndexedSeq))
      val next = matched
        .select(col("dst")).as[Long]
        // primitive sort-dedup (no per-element hash allocations — the
        // matched dst stream is the hop's hot loop)
        .mapPartitions { it =>
          val arr = it.toArray
          java.util.Arrays.sort(arr)
          var n = 0
          var i = 0
          while (i < arr.length) {
            if (n == 0 || arr(n - 1) != arr(i)) { arr(n) = arr(i); n += 1 }
            i += 1
          }
          arr.iterator.take(n)
        }
        .collect().distinct
        .filter(!visited.contains(_))
      next.foreach(visited(_) = h)
      frontier = next
    }

    // one partition: the driver-tier result is small by construction
    // (≤ maxDriverFrontier), and a single-partition child satisfies
    // every required distribution — the caller's sort/agg/count plans
    // exchange-free (one scheduled job instead of an AQE stage pair)
    val driverPart = visited.toSeq.map { case (n, hp) => (n, hp) }
      .toDF("node_id", "hop").coalesce(1)
    if (h >= hopNum || frontier.isEmpty) {
      if (!callerCached) e.unpersist(blocking = false) // BFS done
      return driverPart
    }

    // distributed fallback for the (rare) giant-frontier remainder.
    // `levels` always holds every visited level INCLUDING the current
    // frontier (driverPart covers the hand-off frontier).
    val eCk = e.localCheckpoint(true)
    val broadcastable = 1000000L
    var levels = List(driverPart.localCheckpoint(true))
    var fr = frontier.toSeq.map((_, h)).toDF("node_id", "hop")
      .localCheckpoint(true)
    var frontierN = frontier.length.toLong
    var visitedN = visited.size.toLong
    while (h < hopNum && frontierN > 0) {
      h += 1
      val visitedIds = levels.map(_.select("node_id")).reduce(_ union _)
      val frJ = if (frontierN <= broadcastable) broadcast(fr) else fr
      val vi = if (visitedN <= broadcastable) broadcast(visitedIds)
               else visitedIds
      val next = eCk.join(frJ, frJ("node_id") === eCk("src"))
        .select(eCk("dst").as("node_id")).distinct()
        .join(vi, Seq("node_id"), "left_anti")
        .withColumn("hop", lit(h))
        // truncate lineage: hop h's plan must not re-derive hops 1..h-1
        .localCheckpoint(true)
      levels ::= next
      fr = next
      frontierN = next.count() // cached — a fast cache-scan job
      visitedN += frontierN
    }
    if (!callerCached) e.unpersist(blocking = false) // levels are localCheckpoint-ed
    levels.reduce(_ union _)
  }
}
