package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._
import graft.query.{InfluxQL, PromQL}
import graft.server.HttpGateway
import graft.sources.OtlpMetrics
import graft.sources.OtlpMetrics.OtelSample

/** OTLP metrics ingest: wire decode of the opentelemetry-proto subset,
  * the reference's scope-measurement / metric-field / attr-tag schema
  * (`otlp_metrics_writer.go`), and the HTTP route. */
class OtlpMetricsSpec extends SparkSpec {

  private val samples = Seq(
    OtelSample("app.runtime", "heap_bytes", Map("host" -> "a"),
      1000000000L, 512.0),
    OtelSample("app.runtime", "heap_bytes", Map("host" -> "b"),
      1000000000L, 256.5),
    OtelSample("app.runtime", "gc_count", Map("host" -> "a"),
      1000000000L, 3.0))

  test("encode/decode round-trips; resource attrs merge into tags") {
    val body = OtlpMetrics.encode("app.runtime",
      Map("service.name" -> "svc1"), samples)
    val got = OtlpMetrics.decode(body)
    assert(got.toSet == samples.map(s =>
      s.copy(tags = s.tags + ("service.name" -> "svc1"))).toSet)
  }

  test("gzipped bodies decode transparently") {
    val plain = OtlpMetrics.encode("s", Map.empty, samples.take(1))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    assert(OtlpMetrics.decode(bos.toByteArray) ==
      OtlpMetrics.decode(plain))
  }

  test("toMeasurements: scope measurement, field per metric, tag cols") {
    val ms = OtlpMetrics.toMeasurements(spark, samples)
    assert(ms.keySet == Set("app.runtime"))
    val (df, tags) = ms("app.runtime")
    assert(tags == Seq("host"))
    assert(df.columns.toSeq == Seq("host", "gc_count", "heap_bytes", "ts"))
    val rows = df.orderBy("host")
      .collect().map(r => (r.getAs[String]("host"),
        Option(r.getAs[java.lang.Double]("gc_count")),
        Option(r.getAs[java.lang.Double]("heap_bytes"))))
    // host=a row carries both metrics (enqueueMetrics batching);
    // host=b has no gc_count → null field
    assert(rows.toSeq == Seq(
      ("a", Some(3.0: java.lang.Double), Some(512.0: java.lang.Double)),
      ("b", None, Some(256.5: java.lang.Double))))
  }

  test("fromPayloads decodes archived bodies distributed") {
    import spark.implicits._
    val p1 = OtlpMetrics.encode("s1", Map.empty, samples.take(2))
    val p2 = OtlpMetrics.encode("s2", Map("r" -> "x"), samples.drop(2))
    val out = OtlpMetrics.fromPayloads(
      Seq(p1, p2).toDF("body").repartition(2), "body")
    assert(out.count() == 3)
    assert(out.filter(col("scope") === "s2").count() == 1)
  }

  private lazy val gateway: HttpGateway = {
    val g = new HttpGateway(spark, Map.empty, Map.empty)
    g.start(); g
  }
  private lazy val http = HttpClient.newHttpClient()
  private def url(path: String) =
    URI.create(s"http://127.0.0.1:${gateway.boundPort}$path")

  test("OTLP logs: round-trip, logs measurement, HTTP route") {
    import graft.sources.OtlpLogs
    import graft.sources.OtlpLogs.LogSample
    val logs = Seq(
      LogSample(Map("k8s.pod" -> "p1"), 1500000000L, 9L, "INFO",
        "started ok"),
      LogSample(Map("k8s.pod" -> "p2"), 2500000000L, 17L, "ERROR",
        "boom: disk full"))
    val body = OtlpLogs.encode(Map("service.name" -> "svc1"), logs)
    assert(OtlpLogs.decode(body) == logs.map(l =>
      l.copy(tags = l.tags + ("service.name" -> "svc1"))))
    val (df, tags) = OtlpLogs.toMeasurement(spark, logs)
    assert(tags == Seq("k8s.pod"))
    assert(df.columns.toSeq == Seq("k8s.pod", "severity_number",
      "severity_text", "body", "ts"))
    val r = http.send(HttpRequest.newBuilder(url("/api/v1/otlp/logs"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    val q = java.net.URLEncoder.encode(
      "SELECT count(body) FROM logs WHERE severity_text = 'ERROR'", "UTF-8")
    val resp = http.send(HttpRequest.newBuilder(
      url(s"/query?q=$q&epoch=ms")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
    assert(resp.contains("\"name\":\"logs\""), resp)
    assert(resp.contains("1"), resp)
  }

  test("OTLP traces: round-trip, spans measurement, HTTP route") {
    import graft.sources.OtlpTraces
    import graft.sources.OtlpTraces.SpanSample
    val spans = Seq(
      SpanSample(
        Map("trace_id" -> "0af7651916cd43dd8448eb211c80319c",
          "span_id" -> "b7ad6b7169203331"),
        time_ns = 1500000000L, parent_span_id = "", name = "GET /api",
        kind = 2, duration_nano = 250000000L,
        end_time_unix_nano = 1750000000L, status_code = 0,
        status_message = "", attrs = Map("http.method" -> "GET")),
      SpanSample(
        Map("trace_id" -> "0af7651916cd43dd8448eb211c80319c",
          "span_id" -> "00f067aa0ba902b7"),
        time_ns = 1550000000L, parent_span_id = "b7ad6b7169203331",
        name = "SELECT db", kind = 3, duration_nano = 100000000L,
        end_time_unix_nano = 1650000000L, status_code = 2,
        status_message = "timeout", attrs = Map.empty))
    val body = OtlpTraces.encode(Map("service.name" -> "svc1"), spans)
    // decode round-trips, with resource attrs merged into the tags
    assert(OtlpTraces.decode(body) == spans.map(s =>
      s.copy(tags = s.tags + ("service.name" -> "svc1"))))
    // otel2influx common schema: trace_id/span_id tags, duration field
    val (df, tags) = OtlpTraces.toMeasurement(spark, spans)
    assert(tags == Seq("span_id", "trace_id"))
    assert(df.columns.contains("duration_nano") &&
      df.columns.contains("ts") && df.columns.contains("http.method"))
    val r = http.send(HttpRequest.newBuilder(url("/api/v1/otlp/traces"))
      .header("Content-Type", "application/x-protobuf")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    val q = java.net.URLEncoder.encode(
      "SELECT max(duration_nano) FROM spans WHERE trace_id = " +
        "'0af7651916cd43dd8448eb211c80319c'", "UTF-8")
    val resp = http.send(HttpRequest.newBuilder(
      url(s"/query?q=$q&epoch=ms")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
    assert(resp.contains("\"name\":\"spans\""), resp)
    assert(resp.contains("250000000"), resp)
    // garbage is a 400, not a crash
    val bad = http.send(HttpRequest.newBuilder(url("/api/v1/otlp/traces"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(Array[Byte](9, 9)))
      .build(), HttpResponse.BodyHandlers.ofString())
    assert(bad.statusCode() == 400)
  }

  test("OTLP traces: attrs/tags colliding with fixed columns are renamed") {
    import graft.sources.OtlpTraces
    import graft.sources.OtlpTraces.SpanSample
    val spans = Seq(SpanSample(
      Map("trace_id" -> "0af7651916cd43dd8448eb211c80319c",
        "span_id" -> "b7ad6b7169203331",
        "kind" -> "resource-kind"), // resource attr shadowing a fixed col
      time_ns = 1500000000L, parent_span_id = "", name = "op", kind = 2,
      duration_nano = 1L, end_time_unix_nano = 2L, status_code = 0,
      status_message = "",
      // span attrs shadowing a fixed col and a tag key
      attrs = Map("name" -> "attr-name", "trace_id" -> "attr-trace")))
    val (df, tags) = OtlpTraces.toMeasurement(spark, spans)
    assert(df.columns.count(_ == "name") == 1)
    assert(df.columns.count(_ == "kind") == 1)
    assert(df.columns.count(_ == "trace_id") == 1)
    assert(tags.contains("tag_kind"), tags)
    assert(df.columns.contains("attr_name") &&
      df.columns.contains("attr_trace_id"), df.columns.toSeq)
    val row = df.select("tag_kind", "attr_name", "attr_trace_id", "name",
      "kind").collect()(0)
    assert(row.getString(0) == "resource-kind")
    assert(row.getString(1) == "attr-name")
    assert(row.getString(2) == "attr-trace")
    assert(row.getString(3) == "op" && row.getLong(4) == 2L)
  }

  test("POST /api/v1/otlp/metrics ingests; InfluxQL sees the fields") {
    val body = OtlpMetrics.encode("app.runtime",
      Map("service.name" -> "svc1"), samples)
    val r = http.send(HttpRequest.newBuilder(url("/api/v1/otlp/metrics"))
      .header("Content-Type", "application/x-protobuf")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    val q = java.net.URLEncoder.encode(
      "SELECT sum(heap_bytes), max(gc_count) FROM \"app.runtime\"", "UTF-8")
    val resp = http.send(HttpRequest.newBuilder(
      url(s"/query?q=$q&epoch=ms")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
    assert(resp.contains("\"name\":\"app.runtime\""), resp)
    assert(resp.contains("768.5") && resp.contains("3"), resp)
    // garbage is a 400, not a crash
    val bad = http.send(HttpRequest.newBuilder(url("/api/v1/otlp/metrics"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(Array[Byte](9, 9)))
      .build(), HttpResponse.BodyHandlers.ofString())
    assert(bad.statusCode() == 400)
  }
}
