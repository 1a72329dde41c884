package graft

import org.apache.spark.sql.functions._
import graft.query.LogPipe

/** Pipe-syntax log query language. The render corpus replays the
  * reference's own parser tests (`lib/util/lifted/logparser/
  * logparser_test.go`) — expectation strings verbatim. */
class LogPipeSpec extends SparkSpec {
  import spark.implicits._

  private def rendered(q: String): String = LogPipe.render(LogPipe.parse(q))

  test("logparser_test.go corpus: special types, field:value, multi-term, " +
      "precedence, wildcard, ranges — rendered text matches the reference " +
      "expectations verbatim") {
    val corpus = Seq(
      // TestLogParserForSpecialType / ForFieldAndType
      "127.0.0.10" -> "__log___::string MATCHPHRASE '127.0.0.10'",
      "2023-06-13" -> "__log___::string MATCHPHRASE '2023-06-13'",
      "10:00:00" -> "__log___::string MATCHPHRASE '10:00:00'",
      "host: 127.0.0.10" -> "host MATCHPHRASE '127.0.0.10'",
      "date: 2023-06-13" -> "date MATCHPHRASE '2023-06-13'",
      "path:/var/log/messages/" -> "path MATCHPHRASE '/var/log/messages/'",
      // TestLogParserForMultiSpecialType
      "(2023-06-13 OR 127.0.0.10) AND time:10:00:00" ->
        ("(__log___::string MATCHPHRASE '2023-06-13' OR __log___::string " +
          "MATCHPHRASE '127.0.0.10') AND time MATCHPHRASE '10:00:00'"),
      "time AND host:127.0.0.10 AND host:127.0.0.11" ->
        ("__log___::string MATCHPHRASE 'time' AND host MATCHPHRASE " +
          "'127.0.0.10' AND host MATCHPHRASE '127.0.0.11'"),
      "(/var/log/messages OR path:/var/log/messages) AND ip:127.0.0.10" ->
        ("(__log___::string MATCHPHRASE '/var/log/messages' OR path " +
          "MATCHPHRASE '/var/log/messages') AND ip MATCHPHRASE '127.0.0.10'"),
      "123456789" -> "__log___::string MATCHPHRASE '123456789'",
      "request:123456789" -> "request MATCHPHRASE '123456789'",
      // TestLogParserForMultiTerm (adjacency binds tighter than OR)
      "get iamges and process" ->
        ("__log___::string MATCHPHRASE 'get' AND __log___::string " +
          "MATCHPHRASE 'iamges' AND __log___::string MATCHPHRASE 'process'"),
      "iamges OR simulating process" ->
        ("__log___::string MATCHPHRASE 'iamges' OR __log___::string " +
          "MATCHPHRASE 'simulating' AND __log___::string MATCHPHRASE 'process'"),
      "get iamges or request:process" ->
        ("__log___::string MATCHPHRASE 'get' AND __log___::string " +
          "MATCHPHRASE 'iamges' OR request MATCHPHRASE 'process'"),
      "\"get iamges\" or request:process" ->
        ("__log___::string MATCHPHRASE 'get iamges' OR request " +
          "MATCHPHRASE 'process'"),
      "request:process AND \"get iamges\"" ->
        "request MATCHPHRASE 'process' AND __log___::string MATCHPHRASE 'get iamges'",
      "request:process OR get iamges" ->
        ("request MATCHPHRASE 'process' OR __log___::string MATCHPHRASE " +
          "'get' AND __log___::string MATCHPHRASE 'iamges'"),
      "request:process OR request:iamges" ->
        "request MATCHPHRASE 'process' OR request MATCHPHRASE 'iamges'",
      "get iamges \"HTTP 1.0\"" ->
        ("__log___::string MATCHPHRASE 'get' AND __log___::string " +
          "MATCHPHRASE 'iamges' AND __log___::string MATCHPHRASE 'HTTP 1.0'"),
      "request:simulating process OR get iamges" ->
        ("request MATCHPHRASE 'simulating' AND __log___::string MATCHPHRASE " +
          "'process' OR __log___::string MATCHPHRASE 'get' AND " +
          "__log___::string MATCHPHRASE 'iamges'"),
      // TestLogParserForWildCard
      "content: *" -> "content != ''",
      // TestLogParserForRangeExpr ("field" is an InfluxQL keyword → quoted)
      "field in (10 100)" -> "\"field\" > '10' AND \"field\" < '100'",
      "field in (10 100]" -> "\"field\" > '10' AND \"field\" <= '100'",
      "field in [10 100)" -> "\"field\" >= '10' AND \"field\" < '100'",
      "field in [10 100]" -> "\"field\" >= '10' AND \"field\" <= '100'",
      "field in [10 100] and a<100" ->
        "\"field\" >= '10' AND \"field\" <= '100' AND a < '100'"
    )
    corpus.foreach { case (in, want) =>
      assert(rendered(in) == want, s"\ninput:  $in")
    }
  }

  test("logparser_test.go extract corpus: EXTRACT compiles to UNNEST " +
      "match_all; pipes AND conditions; at most one extract") {
    val corpus = Seq(
      "get iamges|EXTRACT(tags:\"([a-z]+):([a-z]+)\") AS(key1,   value1)|key1:http" ->
        ("__log___::string MATCHPHRASE 'get' AND __log___::string MATCHPHRASE " +
          "'iamges' AND key1 MATCHPHRASE 'http'|UNNEST(match_all(" +
          "\"([a-z]+):([a-z]+)\", tags)) AS(key1, value1)"),
      "get iamges|EXTRACT(\"([a-z]+):([a-z]+)\") AS(key1,   value1)|key1:http" ->
        ("__log___::string MATCHPHRASE 'get' AND __log___::string MATCHPHRASE " +
          "'iamges' AND key1 MATCHPHRASE 'http'|UNNEST(match_all(" +
          "\"([a-z]+):([a-z]+)\", __log___::string)) AS(key1, value1)"),
      "get|EXTRACT(\"([a-z]+)\") AS(key1)" ->
        ("__log___::string MATCHPHRASE 'get'|UNNEST(match_all(\"([a-z]+)\", " +
          "__log___::string)) AS(key1)"),
      "EXTRACT(\"([a-z]+)\") AS(key1)" ->
        "|UNNEST(match_all(\"([a-z]+)\", __log___::string)) AS(key1)"
    )
    corpus.foreach { case (in, want) =>
      assert(rendered(in) == want, s"\ninput:  $in")
    }
    // `*|EXTRACT…`: the handler strips the match-all segment BEFORE parse
    // (removeMulAndSpace) — after stripping, same as the bare-extract case
    val stripped = LogPipe.stripStarSegments("*|EXTRACT(\"([a-z]+)\") AS(key1)")
    assert(rendered(stripped) ==
      "|UNNEST(match_all(\"([a-z]+)\", __log___::string)) AS(key1)")
    // two extracts is the reference's explicit error (sql.y:168)
    val e = intercept[RuntimeException](LogPipe.parse(
      "EXTRACT(\"a\") AS(x)|EXTRACT(\"b\") AS(y)"))
    assert(e.getMessage.contains("only one extract"))
  }

  test("Unnest.matchAll guards: names beyond the pattern's capture-group " +
      "count raise up front (the reference's per-column extract errored); " +
      "a same-named input column doesn't get clobbered by the temp col") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("ab 12", "keepme")).toDF("text", "_graft_rx_groups0")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Unnest.matchAll(df, "text", "([a-z]+)",
        Seq("w", "too_many"))
    }
    assert(e.getMessage.contains("capture group"), e.getMessage)
    // temp column derives a collision-free name: the user's
    // _graft_rx_groups0 column survives with its value intact
    val out = graft.operators.Unnest.matchAll(df, "text",
      "([a-z]+) ([0-9]+)", Seq("w", "n"))
    val row = out.select("w", "n", "_graft_rx_groups0").head()
    assert(row.getString(0) == "ab" && row.getString(1) == "12" &&
      row.getString(2) == "keepme", row.toString)
  }

  test("splitPplSql: trailing SELECT segment splits off; star segments " +
      "strip; pipes inside quotes don't split") {
    assert(LogPipe.splitPplSql("err | select count(time)") ==
      ("err ", Some("select count(time)")))
    assert(LogPipe.splitPplSql("a:b | c:d") == ("a:b | c:d", None))
    assert(LogPipe.splitPplSql("* | content:* | err") == (" err", None))
    assert(LogPipe.splitPplSql("\"a|select \" x") == ("\"a|select \" x", None))
  }

  test("gateway e2e: /repo/{repo}/logstreams/{stream}/logs, /histogram " +
      "and /analytics serve the pipe language over live HTTP") {
    import java.net.{URI, URLEncoder}
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import java.nio.charset.StandardCharsets.UTF_8
    val g = new graft.server.HttpGateway(spark, Map.empty, Map.empty)
    g.start()
    try {
      val http = HttpClient.newHttpClient()
      def url(p: String) = URI.create(s"http://127.0.0.1:${g.boundPort}$p")
      def get(p: String) = http.send(HttpRequest.newBuilder(url(p)).GET()
        .build(), HttpResponse.BodyHandlers.ofString())
      def post(p: String, b: String) = http.send(HttpRequest.newBuilder(
        url(p)).POST(HttpRequest.BodyPublishers.ofString(b)).build(),
        HttpResponse.BodyHandlers.ofString())
      def enc(s: String) = URLEncoder.encode(s, UTF_8)

      assert(post("/api/v1/repository/applogs", "").statusCode() == 200)
      // logs land via the ordinary write path (repository = db)
      val t0 = 1700000000000L // ms
      val lines = Seq(
        s"""access,host=web1 content="GET /api/users status:200 took 15ms" ${t0 * 1000000}""",
        s"""access,host=web1 content="POST /api/orders status:500 took 250ms" ${(t0 + 60000) * 1000000}""",
        s"""access,host=web2 content="GET /health status:200 took 2ms" ${(t0 + 120000) * 1000000}""",
        s"""access,host=web2 content="GET /api/users status:403 took 9ms" ${(t0 + 180000) * 1000000}"""
      ).mkString("\n")
      assert(post("/write?db=applogs", lines).statusCode() == 204)

      val base = s"/repo/applogs/logstreams/access/logs" +
        s"?from=$t0&to=${t0 + 300000}"
      // full-text term over the content column, newest-first default
      val r1 = get(s"$base&query=${enc("users")}")
      assert(r1.statusCode() == 200, r1.body())
      assert(r1.body().contains("\"count\":2"), r1.body())
      assert(r1.body().indexOf("status:403") <
        r1.body().indexOf("status:200")) // reverse=true → newest first
      // field:value + EXTRACT pipeline: capture then filter on it
      val q2 = "host:web1 | EXTRACT(\"status:([0-9]+)\") AS(st) | st:500"
      val r2 = get(s"$base&query=${enc(q2)}&reverse=false")
      assert(r2.body().contains("\"count\":1"), r2.body())
      assert(r2.body().contains("\"st\":\"500\""), r2.body())
      assert(r2.body().contains("\"keys\":"), r2.body())
      // limit caps and the time key renders epoch-ms
      val r3 = get(s"$base&limit=2&query=")
      assert(r3.body().contains("\"count\":2"))
      assert(r3.body().contains(s""""time":${t0 + 180000}"""))

      // histogram: adaptive buckets cover [from, to), zero-filled
      val h = get(s"/repo/applogs/logstreams/access/histogram" +
        s"?from=$t0&to=${t0 + 300000}&query=${enc("status")}")
      assert(h.statusCode() == 200, h.body())
      assert(h.body().contains("\"count\":4"), h.body())
      assert(h.body().contains(s""""from":$t0"""), h.body())
      // 300s span → 5s buckets (60 of them), each edge clamped in-range
      assert(!h.body().contains(s""""to":${t0 + 300001}"""))

      // analytics: PPL | SELECT tail → dataset of stringified rows
      val a = get(s"/repo/applogs/logstreams/access/analytics" +
        s"?from=$t0&to=${t0 + 300000}" +
        s"&query=${enc("status | select count(content) group by host")}")
      assert(a.statusCode() == 200, a.body())
      assert(a.body().contains("\"dataset\":"), a.body())
      assert(a.body().contains("\"2\""), a.body()) // two rows per host
      assert(a.body().contains("\"total_size\":2"), a.body())

      // bad range errors like getQueryLogRequest
      val bad = get(s"/repo/applogs/logstreams/access/logs?from=9&to=1")
      assert(bad.statusCode() == 400)
      assert(get("/repo/applogs/logstreams/missing/logs?from=1&to=9")
        .statusCode() == 400)
    } finally g.stop()
  }

  test("compile: substring filters, extracted columns usable by later " +
      "segments, numeric comparisons coerce, ranges honor inclusivity") {
    val logs = Seq(
      (1L, "GET /api/users HTTP/1.0 status:200 latency=15"),
      (2L, "POST /api/orders HTTP/1.1 status:500 latency=250"),
      (3L, "GET /health HTTP/1.1 status:200 latency=2"),
      (4L, "DELETE /api/users/7 HTTP/1.0 status:403 latency=40")
    ).toDF("time", "content")

    // bare full-text term
    val hits = LogPipe.compile(logs, LogPipe.parse("GET"), "content")
      .select("time").as[Long].collect().toSet
    assert(hits == Set(1L, 3L))

    // adjacency AND + OR precedence
    val both = LogPipe.compile(logs,
        LogPipe.parse("GET users or POST"), "content")
      .select("time").as[Long].collect().toSet
    assert(both == Set(1L, 2L))

    // extract then filter on the capture in a later segment
    val extracted = LogPipe.compile(logs,
      LogPipe.parse("EXTRACT(\"status:([0-9]+)\") AS(st)|st:500"), "content")
    assert(extracted.columns.contains("st"))
    assert(extracted.select("time").as[Long].collect().toSeq == Seq(2L))

    // numeric range over an extracted (string) column: lexicographic per
    // the reference's string-literal comparisons; numeric columns coerce
    val lat = LogPipe.compile(logs,
      LogPipe.parse("EXTRACT(\"latency=([0-9]+)\") AS(lat)"), "content")
      .withColumn("lat_n", col("lat").cast("long"))
    val mid = LogPipe.compile(lat, LogPipe.parse("lat_n in [15 250)"), "content")
      .select("time").as[Long].collect().toSet
    assert(mid == Set(1L, 4L))

    // wildcard → not-empty
    val all = LogPipe.compile(logs, LogPipe.parse("content: *"), "content")
    assert(all.count() == 4)
  }
}
