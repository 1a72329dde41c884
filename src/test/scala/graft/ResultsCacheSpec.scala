package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.ResultsCache

/** Extent-splitting results cache (`httpd/results_cache.go` semantics):
  * repeated range queries only evaluate uncovered sub-ranges; the fresh
  * edge is never stored; extents merge. Pure driver-side unit — no
  * Spark needed. */
class ResultsCacheSpec extends AnyFunSuite {

  // a fake evaluator producing one sample per 10s step; records calls
  private class Harness(freshnessMs: Long = 0L, minExtentMs: Long = 0L) {
    val cache = new ResultsCache[(Long, Double)](_._1,
      freshnessMs = freshnessMs, minExtentMs = minExtentMs)
    var calls = Seq.empty[(Long, Long)]
    def eval(lo: Long, hi: Long): Seq[(Long, Double)] = {
      calls :+= ((lo, hi))
      val k0 = (lo + 9999) / 10000
      (k0 * 10000 to hi by 10000).map(t => (t, t / 1000.0))
    }
    def fetch(lo: Long, hi: Long, now: Long = Long.MaxValue / 2) =
      cache.fetch("q", lo, hi, now)(eval)
  }

  test("second identical fetch is served fully from cache") {
    val h = new Harness
    val first = h.fetch(0, 100000)
    assert(h.calls == Seq((0L, 100000L)))
    val second = h.fetch(0, 100000)
    assert(h.calls.size == 1) // no new evaluation
    assert(second == first)
    assert(h.cache.stats._1 > 0)
  }

  test("extending the range evaluates only the gap") {
    val h = new Harness
    h.fetch(0, 100000)
    val extended = h.fetch(0, 200000)
    assert(h.calls == Seq((0L, 100000L), (100001L, 200000L)))
    // union equals a from-scratch evaluation
    val direct = new Harness().fetch(0, 200000)
    assert(extended == direct)
  }

  test("a hole between two cached extents is the only thing evaluated") {
    val h = new Harness
    h.fetch(0, 50000)
    h.fetch(150000, 200000)
    h.calls = Seq.empty
    val full = h.fetch(0, 200000)
    assert(h.calls == Seq((50001L, 149999L)))
    assert(full == new Harness().fetch(0, 200000))
  }

  test("samples inside the freshness horizon are recomputed each time") {
    val now = 1000000L
    val h = new Harness(freshnessMs = 300000L)
    h.fetch(0, now, now)
    h.calls = Seq.empty
    h.fetch(0, now, now)
    // the mature prefix is cached; only the fresh tail re-evaluates
    assert(h.calls.size == 1)
    val (lo, hi) = h.calls.head
    assert(lo > now - 300000L - 10000L && hi == now)
  }

  test("extents narrower than the minimum are not stored") {
    val h = new Harness(minExtentMs = 60000L)
    h.fetch(0, 30000) // 30s < 1m minimum
    h.calls = Seq.empty
    h.fetch(0, 30000)
    assert(h.calls == Seq((0L, 30000L))) // evaluated again
  }

  test("invalidateAll forgets everything") {
    val h = new Harness
    h.fetch(0, 100000)
    h.cache.invalidateAll()
    h.calls = Seq.empty
    h.fetch(0, 100000)
    assert(h.calls == Seq((0L, 100000L)))
  }

  test("an invalidation landing mid-fetch suppresses the stale store") {
    // fetch reads the cache, evaluates gaps outside the lock, stores in
    // a second critical section. If invalidateAll() (a write) lands in
    // between, the pre-write rows must NOT repopulate the fresh cache.
    val racing = new ResultsCache[(Long, Double)](_._1,
      freshnessMs = 0L, minExtentMs = 0L)
    var calls = 0
    def eval(lo: Long, hi: Long): Seq[(Long, Double)] = {
      calls += 1
      racing.invalidateAll() // the "write" arrives during evaluation
      Seq((lo, 1.0))
    }
    racing.fetch("q", 0, 100000, Long.MaxValue / 2)(eval)
    assert(calls == 1)
    // nothing stored → the next fetch must evaluate again
    racing.fetch("q", 0, 100000, Long.MaxValue / 2) { (lo, hi) =>
      calls += 1; Seq((lo, 1.0))
    }
    assert(calls == 2, "stale pre-invalidation rows must not be served")
  }

  test("TTL backstop: extents expire and re-evaluate; 0 disables") {
    // the reference bounds staleness by TTL; invalidateAll covers only
    // in-process writes, the TTL covers out-of-band data changes
    val c = new ResultsCache[(Long, Double)](_._1,
      freshnessMs = 0L, minExtentMs = 0L, ttlMs = 1000L)
    var calls = 0
    def eval(lo: Long, hi: Long): Seq[(Long, Double)] = {
      calls += 1; Seq((lo, 1.0))
    }
    c.fetch("q", 0, 10000, nowMs = 5000000L)(eval)
    assert(calls == 1)
    c.fetch("q", 0, 10000, nowMs = 5000500L)(eval) // inside TTL: hit
    assert(calls == 1)
    c.fetch("q", 0, 10000, nowMs = 5002000L)(eval) // expired: re-eval
    assert(calls == 2)
    // and the re-evaluated extent is served again afterwards
    c.fetch("q", 0, 10000, nowMs = 5002500L)(eval)
    assert(calls == 2)
  }

  test("LRU evicts the oldest key at capacity; hits refresh recency") {
    var n = 0
    val c = new ResultsCache[(Long, Double)](_._1, freshnessMs = 0L,
      minExtentMs = 0L, maxEntries = 2)
    def eval(lo: Long, hi: Long): Seq[(Long, Double)] = {
      n += 1; Seq((lo, 1.0))
    }
    c.fetch("a", 0, 10000, Long.MaxValue / 2)(eval)
    c.fetch("b", 0, 10000, Long.MaxValue / 2)(eval)
    c.fetch("c", 0, 10000, Long.MaxValue / 2)(eval) // evicts "a"
    assert(n == 3)
    c.fetch("b", 0, 10000, Long.MaxValue / 2)(eval) // hit
    assert(n == 3)
    c.fetch("a", 0, 10000, Long.MaxValue / 2)(eval) // miss again: evicts "c"
    assert(n == 4)
    // the "b" hit above refreshed its recency, so "c" (not "b") was
    // evicted by re-adding "a"
    c.fetch("b", 0, 10000, Long.MaxValue / 2)(eval)
    assert(n == 4)
    c.fetch("c", 0, 10000, Long.MaxValue / 2)(eval)
    assert(n == 5)
  }
}
