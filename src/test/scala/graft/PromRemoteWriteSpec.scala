package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.functions._
import graft.query.{InfluxQL, PromQL}
import graft.server.HttpGateway
import graft.sources.PromRemoteWrite
import graft.sources.PromRemoteWrite.{FlatSample, Series}

/** Prometheus remote-write: wire-codec round trips, the reference's
  * `timeSeries2Rows` label mapping (`httpd/handler_prom_util.go:315`),
  * the HTTP ingest route, and the distributed payload-replay path. */
class PromRemoteWriteSpec extends SparkSpec {

  private val series = Seq(
    Series(Map("__name__" -> "http_requests", "job" -> "api",
      "instance" -> "a:9090"), Seq((1000L, 1.0), (2000L, 3.5))),
    Series(Map("__name__" -> "http_requests", "job" -> "api",
      "instance" -> "b:9090"), Seq((1000L, 2.0))),
    Series(Map("job" -> "bare"), Seq((5000L, -7.25))))

  test("encode/decode round-trips through snappy+protobuf") {
    val decoded = PromRemoteWrite.decode(PromRemoteWrite.encode(series))
    assert(decoded == series)
  }

  test("decoder skips unknown fields (exemplar-bearing payloads)") {
    // splice an unknown length-delimited field (number 3) into a
    // TimeSeries: decode must ignore it, per proto3 unknown-field rules
    val ts = {
      val label = Array[Byte](0x0a, 3) ++ "foo".getBytes("UTF-8") ++
        Array[Byte](0x12, 1) ++ "x".getBytes("UTF-8")
      val lab = Array[Byte](0x0a, label.length.toByte) ++ label
      val junk = Array[Byte](0x1a, 4, 1, 2, 3, 4) // field 3, wire 2
      val sample = Array[Byte](0x12, 11, 0x09, 0, 0, 0, 0, 0, 0,
        0xf0.toByte, 0x3f, 0x10, 10) // value=1.0, ts=10
      lab ++ junk ++ sample
    }
    val req = Array[Byte](0x0a, ts.length.toByte) ++ ts
    val out = PromRemoteWrite.decodeUncompressed(req)
    assert(out == Seq(Series(Map("foo" -> "x"), Seq((10L, 1.0)))))
  }

  test("truncated payloads fail with a message, not an NPE") {
    val good = PromRemoteWrite.encode(series)
    val raw = org.xerial.snappy.Snappy.uncompress(good)
    val e = intercept[RuntimeException] {
      PromRemoteWrite.decodeUncompressed(raw.dropRight(3))
    }
    assert(e.getMessage.contains("remote write"))
  }

  test("__name__ selects the measurement; other labels become tags") {
    val flat = PromRemoteWrite.flatten(series)
    assert(flat.count(_.metric == "http_requests") == 3)
    // no __name__ → the reference's default measurement
    // (promql2influxql/constant.go:20)
    assert(flat.filter(_.metric == "prom_metric_not_specified") ==
      Seq(FlatSample("prom_metric_not_specified", Map("job" -> "bare"),
        5000L, -7.25)))
    assert(!flat.exists(_.labels.contains("__name__")))
  }

  test("toMeasurements builds tag+value+ts frames per metric") {
    val ms = PromRemoteWrite.toMeasurements(spark, series)
    assert(ms.keySet == Set("http_requests", "prom_metric_not_specified"))
    val (df, tags) = ms("http_requests")
    assert(tags == Seq("instance", "job"))
    assert(df.columns.toSeq == Seq("instance", "job", "value", "ts"))
    val got = df.orderBy("instance", "ts")
      .select(col("instance"), col("job"), col("value"),
        unix_millis(col("ts")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(got == Seq(("a:9090", "api", 1.0, 1000L),
      ("a:9090", "api", 3.5, 2000L), ("b:9090", "api", 2.0, 1000L)))
  }

  test("fromPayloads replays archived bodies distributed") {
    import spark.implicits._
    // two independent payload blobs, as an archive table would hold them
    val p1 = PromRemoteWrite.encode(series.take(2))
    val p2 = PromRemoteWrite.encode(series.drop(2))
    val payloads = Seq(p1, p2).toDF("body").repartition(2)
    val out = PromRemoteWrite.fromPayloads(payloads, "body")
    assert(out.columns.toSeq ==
      Seq("metric", "labels", "time_ms", "value"))
    assert(out.count() == 4)
    assert(out.filter(col("metric") === "http_requests").count() == 3)
    // decode runs inside the flatMap — no collect in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("SerializeFromObject"))
  }

  // ------------------------------------------------------------- HTTP e2e
  private lazy val gateway: HttpGateway = {
    val g = new HttpGateway(spark, Map.empty, Map.empty)
    g.start(); g
  }
  private lazy val http = HttpClient.newHttpClient()
  private def url(path: String) =
    URI.create(s"http://127.0.0.1:${gateway.boundPort}$path")
  private def post(path: String, body: Array[Byte]): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(url(path))
      .header("Content-Type", "application/x-protobuf")
      .header("Content-Encoding", "snappy")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(url(path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /api/v1/prom/write ingests; series query back both ways") {
    val r = post("/api/v1/prom/write", PromRemoteWrite.encode(series))
    assert(r.statusCode() == 204)
    // InfluxQL path sees a measurement with tags + value field
    val enc = java.net.URLEncoder.encode(
      "SELECT sum(value) FROM http_requests", "UTF-8")
    val body = get(s"/query?q=$enc&epoch=ms").body()
    assert(body.contains("\"name\":\"http_requests\""))
    assert(body.contains("6.5"))
    // PromQL instant query sees the same series
    val q = java.net.URLEncoder.encode("sum(http_requests)", "UTF-8")
    val prom = get(s"/api/v1/query?query=$q&time=2").body()
    val json = JsonMethods.parse(prom)
    assert((json \ "status") == JString("success"))
    val JArray(result) =
      (json \ "data" \ "result").asInstanceOf[JArray]
    val JString(v) = result.head \ "value" match {
      case JArray(List(_, s)) => s
      case other => sys.error(s"bad value: $other")
    }
    assert(v.toDouble == 5.5) // a:9090@2s = 3.5 + b:9090@1s (lookback) = 2.0
    // remote write appends across requests
    val r2 = post("/api/v1/write", PromRemoteWrite.encode(Seq(
      Series(Map("__name__" -> "http_requests", "job" -> "api",
        "instance" -> "a:9090"), Seq((3000L, 10.0))))))
    assert(r2.statusCode() == 204)
    val body2 = get(s"/query?q=$enc&epoch=ms").body()
    assert(body2.contains("16.5"))
  }

  test("malformed remote-write body is a 400, not a crash") {
    val r = post("/api/v1/prom/write", Array[Byte](1, 2, 3))
    assert(r.statusCode() == 400)
    assert(r.body().contains("error"))
    assert(get("/ping").statusCode() == 204)
  }

  // --------------------------------------------------------- remote read
  import graft.sources.PromRemoteRead
  import graft.sources.PromRemoteRead.{Matcher, Query}

  test("ReadRequest round-trips; matcher types behave like Prometheus") {
    val q = Query(1000L, 5000L, Seq(Matcher(0, "__name__", "m"),
      Matcher(2, "job", "a.*"), Matcher(1, "instance", "x"),
      Matcher(3, "zone", "eu-.*")))
    // encode a request by hand through the response writer's primitives:
    // reuse encodeResponse's shape via a manual WriteRequest-style check
    assert(Matcher(0, "j", "a").matches("a") && !Matcher(0, "j", "a").matches("b"))
    assert(Matcher(2, "j", "ab?c").matches("ac") && !Matcher(2, "j", "a.").matches("abc"))
    assert(Matcher(3, "j", "a.*").matches("b") && !Matcher(3, "j", "a.*").matches("ab"))
    val resp = PromRemoteRead.encodeResponse(Seq(series, Nil))
    assert(PromRemoteRead.decodeResponse(resp) == Seq(series, Nil))
    assert(q.matchers.size == 4) // exercised above
  }

  test("POST /api/v1/read returns matching raw samples") {
    // ensure data is present (idempotent across test ordering: the
    // write-ingest test may or may not have run first — write a
    // dedicated metric)
    val mySeries = Seq(
      Series(Map("__name__" -> "read_metric", "job" -> "api",
        "instance" -> "a"), Seq((1000L, 1.0), (2000L, 3.5), (9000L, 8.0))),
      Series(Map("__name__" -> "read_metric", "job" -> "worker",
        "instance" -> "b"), Seq((1500L, 2.0))))
    assert(post("/api/v1/prom/write",
      PromRemoteWrite.encode(mySeries)).statusCode() == 204)

    // build a ReadRequest: time range [0, 5000], job=~"a.*"
    val req = {
      // hand-encode: ReadRequest{queries=[Query{1,2,3}]} via the public
      // wire layout (varint fields 1,2; matcher messages field 3)
      def matcher(t: Int, n: String, v: String): Array[Byte] = {
        val nb = n.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
        Array[Byte](0x08, t.toByte, 0x12, nb.length.toByte) ++ nb ++
          Array[Byte](0x1a.toByte, vb.length.toByte) ++ vb
      }
      val m1 = matcher(0, "__name__", "read_metric")
      val m2 = matcher(2, "job", "a.*")
      val body = Array[Byte](0x08, 0) ++ // start_ms = 0
        encVarint(2, 5000L) ++
        Array[Byte](0x1a.toByte, m1.length.toByte) ++ m1 ++
        Array[Byte](0x1a.toByte, m2.length.toByte) ++ m2
      val q = Array[Byte](0x0a, body.length.toByte) ++ body
      org.xerial.snappy.Snappy.compress(q)
    }
    val r = post("/api/v1/read", req)
    assert(r.statusCode() == 200, r.body())
    val raw = http.send(HttpRequest.newBuilder(url("/api/v1/read"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(req)).build(),
      HttpResponse.BodyHandlers.ofByteArray()).body()
    val results = PromRemoteRead.decodeResponse(raw)
    assert(results.size == 1)
    val got = results.head
    // only job=api series, only samples ≤ 5000ms
    assert(got == Seq(Series(Map("__name__" -> "read_metric",
      "job" -> "api", "instance" -> "a"), Seq((1000L, 1.0), (2000L, 3.5)))))
  }

  private def encVarint(field: Int, v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]((field << 3).toByte)
    var x = v
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }
}
