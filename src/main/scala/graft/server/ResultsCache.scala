package graft.server

import scala.collection.mutable

/** PromQL range-query results cache with extent splitting — the
  * reference's `httpd/results_cache.go` (`ResultsCache.Do`): cached
  * time EXTENTS of a (query, step) are reused and only the uncovered
  * sub-ranges are evaluated, so a dashboard re-asking the same range
  * query every refresh only computes the newly-arrived steps. Three
  * behaviors mirrored from the reference:
  *
  *   - **freshness horizon** (`MaxCacheFreshness`): eval points newer
  *     than `now − freshness` are never stored — the recent edge is
  *     always recomputed, because that's where late samples land;
  *   - **minimum extent** (`minCacheExtent`): extents narrower than
  *     the minimum are not stored (cache churn isn't worth it);
  *   - extents are step-index ranges, merged when adjacent/overlapping
  *     (`mergeExtents` in the reference), so repeated queries converge
  *     to one extent per key.
  *
  * The cached payload is the COLLECTED result rows (a range-query
  * response is one row per (series, step) — bounded by the grid, not by
  * the data), so a hit costs zero Spark jobs. Correctness leans on the
  * engine's epoch-aligned eval grid: evaluating [a,b] and [b',c]
  * separately yields exactly the rows of [a,c] for step-aligned splits,
  * which ExtentSpec asserts. Rows are deduped by (identity of series,
  * eval step) at assembly as a belt-and-braces guard.
  *
  * Single-JVM driver-side state, like the reference's per-node cache.
  * Callers must [[invalidateAll]] on out-of-band writes (our gateway
  * does on /write and remote write) — the reference instead bounds
  * staleness by TTL because its TSDB is append-only.
  */
final class ResultsCache[R](timeMsOf: R => Long,
                            freshnessMs: Long = 600000L,
                            minExtentMs: Long = 300000L,
                            maxEntries: Int = 128,
                            ttlMs: Long = 0L) {

  // `storedAtMs` feeds the optional TTL backstop (`ttlMs` > 0): the
  // reference bounds staleness by TTL because its TSDB is append-only;
  // here invalidateAll() covers in-process writes and the TTL covers
  // out-of-band data changes (e.g. another process appending to a
  // persisted measurement directory). Merged extents keep the OLDEST
  // store time so the TTL stays conservative.
  private case class Extent(fromMs: Long, toMs: Long, rows: Seq[R],
                            storedAtMs: Long = 0L)

  private val cache = mutable.LinkedHashMap.empty[String, Vector[Extent]]
  private var hitSteps = 0L
  private var missRanges = 0L
  // bumped by invalidateAll; a fetch whose gap evaluation straddles an
  // invalidation must not store its (pre-write) rows back into the
  // fresh cache — without this, stale extents would be served until
  // the next write (the reference bounds the same race by TTL)
  private var generation = 0L

  /** (cached step-rows served, gap evaluations performed) — for specs
    * and ops visibility. */
  def stats: (Long, Long) = synchronized((hitSteps, missRanges))

  def invalidateAll(): Unit = synchronized {
    cache.clear()
    generation += 1
  }

  /** Serve `[startMs, endMs]` of `key`, evaluating only uncovered
    * sub-ranges via `eval(gapStartMs, gapEndMs)`. Returns all rows of
    * the requested range ordered by eval time. */
  def fetch(key: String, startMs: Long, endMs: Long, nowMs: Long)
           (eval: (Long, Long) => Seq[R]): Seq[R] = {
    val (cachedAll, genAtRead) =
      synchronized((cache.getOrElse(key, Vector.empty), generation))
    val cached = cachedAll
      .filter(e => ttlMs <= 0L || nowMs - e.storedAtMs <= ttlMs)
      .filter(e => e.toMs >= startMs && e.fromMs <= endMs)
    // gaps = requested range minus cached coverage
    val gaps = mutable.ArrayBuffer.empty[(Long, Long)]
    var cursor = startMs
    cached.sortBy(_.fromMs).foreach { e =>
      if (e.fromMs > cursor) gaps += ((cursor, math.min(e.fromMs - 1, endMs)))
      cursor = math.max(cursor, e.toMs + 1)
    }
    if (cursor <= endMs) gaps += ((cursor, endMs))

    val fresh = gaps.toSeq.map { case (lo, hi) =>
      Extent(lo, hi, eval(lo, hi), nowMs) }
    synchronized {
      hitSteps += cached.iterator.map(_.rows.size).sum
      missRanges += fresh.size
      // store only mature, wide-enough extents (freshness + min width)
      val horizon = nowMs - freshnessMs
      val storable = fresh.flatMap { e =>
        val capped = e.rows.filter(r => timeMsOf(r) <= horizon)
        val hi = math.min(e.toMs, horizon)
        if (hi - e.fromMs + 1 >= minExtentMs && capped.nonEmpty)
          Some(Extent(e.fromMs, hi, capped, e.storedAtMs))
        else None
      }
      if (generation == genAtRead &&
          (storable.nonEmpty || cache.contains(key))) {
        val live = cache.getOrElse(key, Vector.empty)
          .filter(e => ttlMs <= 0L || nowMs - e.storedAtMs <= ttlMs)
        val merged = mergeExtents(live ++ storable)
        cache.remove(key) // LRU: re-insert at the tail (hits refresh too)
        cache.put(key, merged)
        while (cache.size > maxEntries) cache.remove(cache.head._1)
      }
    }
    (cached.flatMap(_.rows) ++ fresh.flatMap(_.rows))
      .filter(r => timeMsOf(r) >= startMs && timeMsOf(r) <= endMs)
      .distinct
      .sortBy(timeMsOf)
  }

  /** Coalesce overlapping/adjacent extents; on overlap rows dedupe by
    * identity (the engine's grid makes duplicates exact equals). */
  private def mergeExtents(es: Vector[Extent]): Vector[Extent] = {
    val sorted = es.sortBy(_.fromMs)
    val out = mutable.ArrayBuffer.empty[Extent]
    sorted.foreach { e =>
      out.lastOption match {
        case Some(last) if e.fromMs <= last.toMs + 1 =>
          out(out.size - 1) = Extent(last.fromMs,
            math.max(last.toMs, e.toMs),
            (last.rows ++ e.rows).distinct.sortBy(timeMsOf),
            math.min(last.storedAtMs, e.storedAtMs))
        case _ => out += e
      }
    }
    out.toVector
  }
}
