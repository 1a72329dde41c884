package graft

import graft.server.HttpGateway
import graft.sources.PromRemoteWrite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** DDL-invalidation e2e across the engine's three cache layers (the
  * round-9/11 review matrix): after a mid-session DDL mutation,
  *
  *  1. the RESULTS CACHE (PromQL range extents) must not serve rows
  *     computed before the mutation,
  *  2. the resident HOT TIER must not serve stale in-memory batches,
  *  3. the PREPARED-PLAN cache must not serve a plan bound to the old
  *     data,
  *
  * and a RESTARTED gateway over the same persist dir must re-assert the
  * same post-DDL answers (journal replay propagates to the restored
  * prom twins too, not just the InfluxQL catalog). */
class DdlCacheSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()

  test("gateway: DELETE and DROP SHARD invalidate the range-results " +
      "cache and re-point the prom twin; restart replays the same") {
    val dir = Files.createTempDirectory("graft_ddlcache").toString
    def mk() = {
      val g = new HttpGateway(spark, Map.empty, Map.empty,
        persistDir = Some(dir))
      g.start(); g
    }
    def promWrite(g: HttpGateway, metric: String, ts: Long,
                  v: Double): Unit = {
      val body = PromRemoteWrite.encode(Seq(PromRemoteWrite.Series(
        Map("__name__" -> metric, "job" -> "j1"), Seq((ts, v)))))
      val r = http.send(HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${g.boundPort}/api/v1/write"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 204, r.body())
    }
    def range(g: HttpGateway, metric: String): String = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${g.boundPort}/api/v1/query_range?" +
          s"query=${enc(s"sum($metric)")}" +
          // ≥ minExtentMs wide, else the evaluated extent is never stored
          "&start=1704067200&end=1704068400&step=1m")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
    def ask(g: HttpGateway, q: String): HttpResponse[String] = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${g.boundPort}/query?q=${enc(q)}")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

    val g = mk()
    try {
      // two points inside the range grid: 00:00:00 → 5, 00:01:00 → 9
      promWrite(g, "rcm", 1704067200000L, 5.0)
      promWrite(g, "rcm", 1704067260000L, 9.0)
      val first = range(g, "rcm")
      assert(first.contains("\"5\"") && first.contains("\"9\""), first)
      // identical re-ask is served from the cache (hit counter moves)
      val hits0 = g.resultsCacheStats._1
      assert(range(g, "rcm").contains("\"9\""))
      assert(g.resultsCacheStats._1 > hits0,
        s"expected a cache hit, stats=${g.resultsCacheStats}")
      // mid-session DML: delete the 00:01:00 point. The cached extent
      // covered it — a stale cache (or a stale prom twin frame) would
      // keep answering 9.
      assert(ask(g,
        "DELETE FROM rcm WHERE time > '2024-01-01T00:00:30Z'")
        .statusCode() == 200)
      val afterDelete = range(g, "rcm")
      assert(afterDelete.contains("\"5\"") && !afterDelete.contains("\"9\""),
        afterDelete)

      // DROP SHARD leg: two points a week apart → two shard groups;
      // dropping the first group's shard removes the first point from
      // the prom surface too (propagation re-points the twin)
      val wk = 7L * 86400 * 1000
      promWrite(g, "rcs", 1000L, 3.0)
      promWrite(g, "rcs", wk + 1000L, 4.0)
      // instant eval at each point's own time (5m lookback)
      def instant(g2: HttpGateway, atS: Long): String = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${g2.boundPort}/api/v1/query?" +
            s"query=${enc("sum(rcs)")}&time=$atS")).GET()
          .build(), HttpResponse.BodyHandlers.ofString()).body()
      assert(instant(g, 100).contains("\"3\""), instant(g, 100))
      assert(instant(g, wk / 1000 + 100).contains("\"4\""))
      // find the shard holding the FIRST week (start 1970-01-01)
      val shards = ask(g, "SHOW SHARDS").body()
      assert(shards.contains("1970-01-01T00:00:00Z"), shards)
      assert(ask(g, "DROP SHARD 0").statusCode() == 200, shards)
      // first week's point is gone from the prom surface; the later
      // one survives
      val afterDrop = instant(g, 100)
      assert(!afterDrop.contains("\"3\""), afterDrop)
      assert(instant(g, wk / 1000 + 100).contains("\"4\""))
    } finally g.stop()

    // restart: journal replay must propagate the tombstones to the
    // RESTORED prom twins (they reload from the pre-tombstone parquet)
    val g2 = mk()
    try {
      val r = range(g2, "rcm")
      assert(r.contains("\"5\"") && !r.contains("\"9\""), r)
      val wk = 7L * 86400 * 1000
      def instant2(atS: Long): String = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${g2.boundPort}/api/v1/query?" +
            s"query=${enc("sum(rcs)")}&time=$atS")).GET()
          .build(), HttpResponse.BodyHandlers.ofString()).body()
      assert(!instant2(100).contains("\"3\""), instant2(100))
      assert(instant2(wk / 1000 + 100).contains("\"4\""))
    } finally g2.stop()
  }

  test("hot tier + prepared-plan cache: a table regenerated mid-session " +
      "misses both (fresh plan over fresh resident batches)") {
    val base = Files.createTempDirectory("graft_ddlplan").toString
    // q01 needs only lineitem
    Files.copy(Paths.get(s"$sf/lineitem.parquet"),
      Paths.get(s"$base/lineitem.parquet"))
    val s2 = spark.newSession()
    s2.conf.set(Tables.hotTierConfKey, Tables.hotTierDefaultMaxBytes.toString)
    val q = SparkEntry.queries("q01_agg_basic")
    def run() = q(s2, base).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        r.getDouble(r.fieldIndex("sum_qty"))).toMap
    val before = run()
    assert(before.nonEmpty)
    // plan-cache warmth: an immediate re-ask returns the same frame
    assert(run() == before)
    // "DDL": regenerate lineitem at the same path with one returnflag
    // filtered out entirely
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_returnflag <> 'R'")
    Files.delete(Paths.get(s"$base/lineitem.parquet"))
    src.write.mode("overwrite").parquet(s"$base/lineitem.parquet")
    val after = run()
    // the dropped flag is gone and surviving sums are unchanged — a
    // stale plan or stale resident batches would still show 'R'
    assert(!after.keySet.exists(_._1 == "R"), after.toString)
    assert(before.keySet.exists(_._1 == "R"))
    after.foreach { case (k, v) => assert(before(k) == v, k) }
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
}
