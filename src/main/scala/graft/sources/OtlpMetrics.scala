package graft.sources

import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** OTLP metrics ingestion (reference: `httpd/handler.go:316` route
  * `POST /api/v1/otlp/metrics` → `handler_otlp.go:109`
  * `serveOtlpMetricsWrite` → `lib/opentelemetry/otlp_metrics_writer.go`):
  * an OTLP/HTTP protobuf `ExportMetricsServiceRequest` becomes
  * measurement rows with the reference's schema —
  * `enqueueMetrics`/`initMetricTagsAndTs` write gauge and sum data
  * points under the instrumentation SCOPE name as the measurement, one
  * FIELD per metric name, with data-point + resource attributes as tags
  * (`otlp_metrics_writer.go:150-185,225-250`).
  *
  * Wire subset decoded (public opentelemetry-proto `metrics.proto` /
  * `common.proto`; unknown fields — histograms, exemplars, traces —
  * are skipped, not errors):
  * {{{
  *   ExportMetricsServiceRequest { repeated ResourceMetrics = 1 }
  *   ResourceMetrics { Resource resource = 1; repeated ScopeMetrics = 2 }
  *   Resource        { repeated KeyValue attributes = 1 }
  *   ScopeMetrics    { InstrumentationScope scope = 1; repeated Metric = 2 }
  *   InstrumentationScope { string name = 1 }
  *   Metric          { string name = 1; Gauge gauge = 5; Sum sum = 7 }
  *   Gauge / Sum     { repeated NumberDataPoint data_points = 1 }
  *   NumberDataPoint { fixed64 time_unix_nano = 3; double as_double = 4;
  *                     sfixed64 as_int = 6; repeated KeyValue attrs = 7 }
  *   KeyValue        { string key = 1; AnyValue value = 2 }
  *   AnyValue        { string = 1; bool = 2; int64 = 3; double = 4 }
  * }}}
  * Reuses [[PromRemoteWrite.Reader]]/`Writer`. Bodies may be gzipped
  * (OTLP/HTTP `Content-Encoding: gzip`).
  */
object OtlpMetrics {
  import PromRemoteWrite.{Reader, Writer}

  /** One decoded number data point, reference row shape: measurement =
    * scope, field = metric, tags = resource + data-point attributes. */
  case class OtelSample(scope: String, metric: String,
                        tags: Map[String, String], time_ns: Long,
                        value: Double)

  // ---------------------------------------------------------- decoding
  private[sources] def readAnyValue(buf: Array[Byte], from: Int, until: Int): String = {
    val r = new Reader(buf, from, until)
    var out = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); out = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (2, 0) => out = (r.varint() != 0).toString
      case (3, 0) => out = r.varint().toString
      case (4, 1) =>
        val d = java.lang.Double.longBitsToDouble(r.fixed64())
        out = if (d == d.toLong.toDouble) d.toLong.toString else d.toString
      case (_, w) => r.skip(w)
    }
    out
  }

  private[sources] def readKeyValue(buf: Array[Byte], from: Int, until: Int): (String, String) = {
    val r = new Reader(buf, from, until)
    var k = ""; var v = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); k = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (2, 2) => val n = r.len(); v = readAnyValue(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    (k, v)
  }

  private def readAttrs(buf: Array[Byte], r: Reader,
                        into: collection.mutable.Map[String, String]): Unit = {
    val n = r.len(); into += readKeyValue(buf, r.pos, r.pos + n); r.pos += n
  }

  private def readDataPoint(buf: Array[Byte], from: Int,
                            until: Int): Option[(Map[String, String], Long, Double)] = {
    val r = new Reader(buf, from, until)
    val attrs = collection.mutable.Map.empty[String, String]
    var ts = 0L; var v = 0.0; var has = false
    while (r.hasMore) r.tag() match {
      case (3, 1) => ts = r.fixed64()
      case (4, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64()); has = true
      case (6, 1) => v = r.fixed64().toDouble; has = true // sfixed64 as_int
      case (7, 2) => readAttrs(buf, r, attrs)
      case (_, w) => r.skip(w)
    }
    if (has) Some((attrs.toMap, ts, v)) else None // Empty-typed point
  }

  private def readPoints(buf: Array[Byte], from: Int, until: Int):
      Seq[(Map[String, String], Long, Double)] = {
    val r = new Reader(buf, from, until)
    val out = Seq.newBuilder[(Map[String, String], Long, Double)]
    while (r.hasMore) r.tag() match {
      case (1, 2) =>
        val n = r.len(); out ++= readDataPoint(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  private def readMetric(buf: Array[Byte], from: Int, until: Int):
      (String, Seq[(Map[String, String], Long, Double)]) = {
    val r = new Reader(buf, from, until)
    var name = ""
    val pts = Seq.newBuilder[(Map[String, String], Long, Double)]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); name = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (5, 2) | (7, 2) => // gauge | sum — same data_points shape
        val n = r.len(); pts ++= readPoints(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w) // histogram/summary/exp-histogram skipped
    }
    (name, pts.result())
  }

  private def readScopeMetrics(buf: Array[Byte], from: Int, until: Int,
                               resourceTags: Map[String, String]): Seq[OtelSample] = {
    val r = new Reader(buf, from, until)
    var scope = "otel"
    val out = Seq.newBuilder[OtelSample]
    val metrics = Seq.newBuilder[(String, Seq[(Map[String, String], Long, Double)])]
    while (r.hasMore) r.tag() match {
      case (1, 2) => // InstrumentationScope { name = 1 }
        val n = r.len()
        val sr = new Reader(buf, r.pos, r.pos + n)
        while (sr.hasMore) sr.tag() match {
          case (1, 2) =>
            val m = sr.len()
            scope = new String(buf, sr.pos, m, "UTF-8"); sr.pos += m
          case (_, w) => sr.skip(w)
        }
        r.pos += n
      case (2, 2) => val n = r.len(); metrics += readMetric(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    metrics.result().foreach { case (metric, pts) =>
      pts.foreach { case (attrs, ts, v) =>
        // resource attributes join the data-point attributes as tags
        // (ResourceToTags, otlp_metrics_writer.go:246)
        out += OtelSample(scope, metric, resourceTags ++ attrs, ts, v)
      }
    }
    out.result()
  }

  private def readResourceMetrics(buf: Array[Byte], from: Int, until: Int): Seq[OtelSample] = {
    val r = new Reader(buf, from, until)
    var resourceTags = Map.empty[String, String]
    val scopeSpans = Seq.newBuilder[(Int, Int)]
    while (r.hasMore) r.tag() match {
      case (1, 2) => // Resource { attributes = 1 }
        val n = r.len()
        val rr = new Reader(buf, r.pos, r.pos + n)
        val attrs = collection.mutable.Map.empty[String, String]
        while (rr.hasMore) rr.tag() match {
          case (1, 2) => readAttrs(buf, rr, attrs)
          case (_, w) => rr.skip(w)
        }
        resourceTags = attrs.toMap
        r.pos += n
      case (2, 2) => val n = r.len(); scopeSpans += ((r.pos, r.pos + n)); r.pos += n
      case (_, w) => r.skip(w)
    }
    // resource may be written after scope_metrics in the stream — decode
    // scopes only once the whole ResourceMetrics message is walked
    scopeSpans.result().flatMap { case (a, b) =>
      readScopeMetrics(buf, a, b, resourceTags)
    }
  }

  /** Decode an `ExportMetricsServiceRequest` (plain or gzip). */
  def decode(body: Array[Byte]): Seq[OtelSample] = {
    val buf =
      if (body.length >= 2 && (body(0) & 0xff) == 0x1f &&
          (body(1) & 0xff) == 0x8b)
        new GZIPInputStream(new java.io.ByteArrayInputStream(body))
          .readAllBytes()
      else body
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[OtelSample]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); out ++= readResourceMetrics(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  // ---------------------------------------------------------- ingestion
  /** One measurement frame per scope: columns = sorted tag keys ++ one
    * DOUBLE field per metric name ++ `ts` — the reference's
    * field-per-metric schema. Rows with identical (tags, ts) carry all
    * their metrics in one row, like `enqueueMetrics` batching. */
  def toMeasurements(spark: SparkSession, samples: Seq[OtelSample]):
      Map[String, (DataFrame, Seq[String])] =
    samples.groupBy(_.scope).map { case (scope, ss) =>
      val tagKeys = ss.flatMap(_.tags.keys).distinct.sorted
      val fieldKeys = ss.map(_.metric).distinct.sorted
      val rows = ss.groupBy(s => (s.tags, s.time_ns)).toSeq
        .map { case ((tags, ts), group) =>
          val fields = group.map(s => s.metric -> s.value).toMap
          org.apache.spark.sql.Row.fromSeq(
            tagKeys.map(tags.get(_).orNull) ++
              fieldKeys.map(f => fields.get(f)
                .map(java.lang.Double.valueOf).orNull) :+
              new java.sql.Timestamp(ts / 1000000L))
        }
      val schema = org.apache.spark.sql.types.StructType(
        tagKeys.map(k => org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.types.StringType)) ++
          fieldKeys.map(f => org.apache.spark.sql.types.StructField(f,
            org.apache.spark.sql.types.DoubleType)) :+
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType))
      scope -> (spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
        schema), tagKeys)
    }

  /** Distributed bulk replay of archived OTLP bodies, one flat row per
    * data point (same design as [[PromRemoteWrite.fromPayloads]]). */
  def fromPayloads(payloads: DataFrame, binCol: String): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(binCol)).as[Array[Byte]]
      .flatMap(b => decode(b))(Encoders.product[OtelSample])
      .toDF()
  }

  // ----------------------------------------------------------- encoding
  /** Sender side, for specs and fan-out: one resource, one scope. */
  def encode(scope: String, resourceTags: Map[String, String],
             samples: Seq[OtelSample]): Array[Byte] = {
    def kv(k: String, v: String): Array[Byte] = {
      val av = new Writer; av.str(1, v)
      val w = new Writer; w.str(1, k); w.bytes(2, av.result())
      w.result()
    }
    val sm = new Writer
    val scopeMsg = new Writer; scopeMsg.str(1, scope)
    sm.bytes(1, scopeMsg.result())
    samples.groupBy(_.metric).toSeq.sortBy(_._1).foreach { case (m, pts) =>
      val gauge = new Writer
      pts.foreach { s =>
        val dp = new Writer
        dp.fixed64(3, s.time_ns)
        dp.fixed64(4, java.lang.Double.doubleToLongBits(s.value))
        s.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
          dp.bytes(7, kv(k, v))
        }
        gauge.bytes(1, dp.result())
      }
      val metric = new Writer
      metric.str(1, m)
      metric.bytes(5, gauge.result())
      sm.bytes(2, metric.result())
    }
    val res = new Writer
    resourceTags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      res.bytes(1, kv(k, v))
    }
    val rm = new Writer
    rm.bytes(1, res.result())
    rm.bytes(2, sm.result())
    val req = new Writer
    req.bytes(1, rm.result())
    req.result()
  }
}

/** OTLP logs ingestion (reference route `handler.go:320`
  * `/api/v1/otlp/logs` → `handler_otlp.go:114` `serveOtlpLogsWrite` →
  * `lib/opentelemetry/otlp_writer.go:147` `WriteLogs`, which delegates
  * to the upstream otel2influx plog writer): log records land in one
  * measurement named `logs` with fields `severity_number`,
  * `severity_text`, `body`, and resource + record attributes as tags.
  * Wire subset (public opentelemetry-proto `logs.proto`):
  * {{{
  *   ExportLogsServiceRequest { repeated ResourceLogs = 1 }
  *   ResourceLogs { Resource resource = 1; repeated ScopeLogs = 2 }
  *   ScopeLogs    { InstrumentationScope scope = 1; repeated LogRecord = 2 }
  *   LogRecord    { fixed64 time_unix_nano = 1; uint32 severity_number = 2;
  *                  string severity_text = 3; AnyValue body = 5;
  *                  repeated KeyValue attributes = 6 }
  * }}}
  */
object OtlpLogs {
  import PromRemoteWrite.{Reader, Writer}

  case class LogSample(tags: Map[String, String], time_ns: Long,
                       severity_number: Long, severity_text: String,
                       body: String)

  val Measurement = "logs"

  private def readLogRecord(buf: Array[Byte], from: Int, until: Int,
                            resourceTags: Map[String, String]): LogSample = {
    val r = new Reader(buf, from, until)
    val attrs = collection.mutable.Map.empty[String, String]
    var ts = 0L; var sevN = 0L; var sevT = ""; var body = ""
    while (r.hasMore) r.tag() match {
      case (1, 1) => ts = r.fixed64()
      case (2, 0) => sevN = r.varint()
      case (3, 2) => val n = r.len(); sevT = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (5, 2) => val n = r.len(); body = OtlpMetrics.readAnyValue(buf, r.pos, r.pos + n); r.pos += n
      case (6, 2) => val n = r.len(); attrs += OtlpMetrics.readKeyValue(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    LogSample(resourceTags ++ attrs.toMap, ts, sevN, sevT, body)
  }

  private def readScopeLogs(buf: Array[Byte], from: Int, until: Int,
                            resourceTags: Map[String, String]): Seq[LogSample] = {
    val r = new Reader(buf, from, until)
    val out = Seq.newBuilder[LogSample]
    while (r.hasMore) r.tag() match {
      case (2, 2) => val n = r.len(); out += readLogRecord(buf, r.pos, r.pos + n, resourceTags); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  private def readResourceLogs(buf: Array[Byte], from: Int, until: Int): Seq[LogSample] = {
    val r = new Reader(buf, from, until)
    var resourceTags = Map.empty[String, String]
    val spans = Seq.newBuilder[(Int, Int)]
    while (r.hasMore) r.tag() match {
      case (1, 2) =>
        val n = r.len()
        val rr = new Reader(buf, r.pos, r.pos + n)
        val attrs = collection.mutable.Map.empty[String, String]
        while (rr.hasMore) rr.tag() match {
          case (1, 2) =>
            val m = rr.len()
            attrs += OtlpMetrics.readKeyValue(buf, rr.pos, rr.pos + m)
            rr.pos += m
          case (_, w) => rr.skip(w)
        }
        resourceTags = attrs.toMap
        r.pos += n
      case (2, 2) => val n = r.len(); spans += ((r.pos, r.pos + n)); r.pos += n
      case (_, w) => r.skip(w)
    }
    spans.result().flatMap { case (a, b) =>
      readScopeLogs(buf, a, b, resourceTags)
    }
  }

  /** Decode an `ExportLogsServiceRequest` (plain or gzip). */
  def decode(body: Array[Byte]): Seq[LogSample] = {
    val buf =
      if (body.length >= 2 && (body(0) & 0xff) == 0x1f &&
          (body(1) & 0xff) == 0x8b)
        new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body)).readAllBytes()
      else body
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[LogSample]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); out ++= readResourceLogs(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  /** The `logs` measurement frame: sorted tag keys ++ (severity_number,
    * severity_text, body, ts). */
  def toMeasurement(spark: SparkSession,
                    samples: Seq[LogSample]): (DataFrame, Seq[String]) = {
    val tagKeys = samples.flatMap(_.tags.keys).distinct.sorted
    val ds = spark.createDataset(samples)(Encoders.product[LogSample])
    val cols = tagKeys.map(k => col("tags").getItem(k).as(k)) ++ Seq(
      col("severity_number"), col("severity_text"), col("body"),
      // `div`, not `/`: double division loses sub-ms precision at
      // epoch-2024 nanosecond magnitudes (ulp = 256 ns)
      timestamp_millis(expr("time_ns div 1000000")).as("ts"))
    (ds.select(cols: _*), tagKeys)
  }

  /** Sender side, for specs: one resource, one scope. */
  def encode(resourceTags: Map[String, String],
             samples: Seq[LogSample]): Array[Byte] = {
    def kv(k: String, v: String): Array[Byte] = {
      val av = new Writer; av.str(1, v)
      val w = new Writer; w.str(1, k); w.bytes(2, av.result())
      w.result()
    }
    val sl = new Writer
    samples.foreach { s =>
      val rec = new Writer
      rec.fixed64(1, s.time_ns)
      rec.int64(2, s.severity_number)
      rec.str(3, s.severity_text)
      val bodyVal = new Writer; bodyVal.str(1, s.body)
      rec.bytes(5, bodyVal.result())
      s.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
        rec.bytes(6, kv(k, v))
      }
      sl.bytes(2, rec.result())
    }
    val res = new Writer
    resourceTags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      res.bytes(1, kv(k, v))
    }
    val rl = new Writer
    rl.bytes(1, res.result())
    rl.bytes(2, sl.result())
    val req = new Writer
    req.bytes(1, rl.result())
    req.result()
  }
}

/** OTLP traces ingestion (reference route `handler.go:312`
  * `POST /api/v1/otlp/traces` → `handler_otlp.go:104`
  * `serveOtlpTracesWrite` → `lib/opentelemetry/otlp_writer.go:111`
  * `WriteTraces`, which delegates to the upstream otel2influx ptrace
  * writer): spans land in one measurement named `spans` with the
  * otel2influx common schema — `trace_id`/`span_id` (lowercase hex) and
  * resource attributes as TAGS; `parent_span_id`, `name`, `kind`,
  * `duration_nano`, `end_time_unix_nano`, status and span attributes as
  * FIELDS; time = span start.
  *
  * Wire subset (public opentelemetry-proto `trace.proto`):
  * {{{
  *   ExportTraceServiceRequest { repeated ResourceSpans = 1 }
  *   ResourceSpans { Resource resource = 1; repeated ScopeSpans = 2 }
  *   ScopeSpans    { InstrumentationScope scope = 1; repeated Span = 2 }
  *   Span { bytes trace_id = 1; bytes span_id = 2;
  *          bytes parent_span_id = 4; string name = 5; varint kind = 6;
  *          fixed64 start_time_unix_nano = 7;
  *          fixed64 end_time_unix_nano = 8;
  *          repeated KeyValue attributes = 9;
  *          Status status = 15 { string message = 2; varint code = 3 } }
  * }}}
  */
object OtlpTraces {
  import PromRemoteWrite.{Reader, Writer}

  case class SpanSample(tags: Map[String, String], time_ns: Long,
                        parent_span_id: String, name: String, kind: Long,
                        duration_nano: Long, end_time_unix_nano: Long,
                        status_code: Long, status_message: String,
                        attrs: Map[String, String])

  val Measurement = "spans"

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def readSpan(buf: Array[Byte], from: Int, until: Int,
                       resourceTags: Map[String, String]): SpanSample = {
    val r = new Reader(buf, from, until)
    val attrs = collection.mutable.Map.empty[String, String]
    var traceId = ""; var spanId = ""; var parent = ""
    var name = ""; var kind = 0L
    var startNs = 0L; var endNs = 0L
    var code = 0L; var msg = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); traceId = hex(buf.slice(r.pos, r.pos + n)); r.pos += n
      case (2, 2) => val n = r.len(); spanId = hex(buf.slice(r.pos, r.pos + n)); r.pos += n
      case (4, 2) => val n = r.len(); parent = hex(buf.slice(r.pos, r.pos + n)); r.pos += n
      case (5, 2) => val n = r.len(); name = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (6, 0) => kind = r.varint()
      case (7, 1) => startNs = r.fixed64()
      case (8, 1) => endNs = r.fixed64()
      case (9, 2) => val n = r.len(); attrs += OtlpMetrics.readKeyValue(buf, r.pos, r.pos + n); r.pos += n
      case (15, 2) => // Status { message = 2; code = 3 }
        val n = r.len()
        val sr = new Reader(buf, r.pos, r.pos + n)
        while (sr.hasMore) sr.tag() match {
          case (2, 2) => val m = sr.len(); msg = new String(buf, sr.pos, m, "UTF-8"); sr.pos += m
          case (3, 0) => code = sr.varint()
          case (_, w) => sr.skip(w)
        }
        r.pos += n
      case (_, w) => r.skip(w) // events/links/trace_state skipped
    }
    SpanSample(
      resourceTags ++ Map("trace_id" -> traceId, "span_id" -> spanId),
      startNs, parent, name, kind, endNs - startNs, endNs, code, msg,
      attrs.toMap)
  }

  private def readScopeSpans(buf: Array[Byte], from: Int, until: Int,
                             resourceTags: Map[String, String]): Seq[SpanSample] = {
    val r = new Reader(buf, from, until)
    val out = Seq.newBuilder[SpanSample]
    while (r.hasMore) r.tag() match {
      case (2, 2) => val n = r.len(); out += readSpan(buf, r.pos, r.pos + n, resourceTags); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  private def readResourceSpans(buf: Array[Byte], from: Int, until: Int): Seq[SpanSample] = {
    val r = new Reader(buf, from, until)
    var resourceTags = Map.empty[String, String]
    val scopes = Seq.newBuilder[(Int, Int)]
    while (r.hasMore) r.tag() match {
      case (1, 2) =>
        val n = r.len()
        val rr = new Reader(buf, r.pos, r.pos + n)
        val attrs = collection.mutable.Map.empty[String, String]
        while (rr.hasMore) rr.tag() match {
          case (1, 2) =>
            val m = rr.len()
            attrs += OtlpMetrics.readKeyValue(buf, rr.pos, rr.pos + m)
            rr.pos += m
          case (_, w) => rr.skip(w)
        }
        resourceTags = attrs.toMap
        r.pos += n
      case (2, 2) => val n = r.len(); scopes += ((r.pos, r.pos + n)); r.pos += n
      case (_, w) => r.skip(w)
    }
    scopes.result().flatMap { case (a, b) =>
      readScopeSpans(buf, a, b, resourceTags)
    }
  }

  /** Decode an `ExportTraceServiceRequest` (plain or gzip). */
  def decode(body: Array[Byte]): Seq[SpanSample] = {
    val buf =
      if (body.length >= 2 && (body(0) & 0xff) == 0x1f &&
          (body(1) & 0xff) == 0x8b)
        new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body)).readAllBytes()
      else body
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[SpanSample]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); out ++= readResourceSpans(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  /** The `spans` measurement frame: sorted tag keys (trace_id, span_id,
    * resource attrs) ++ span fields ++ one string field per span
    * attribute ++ ts (= span start). */
  def toMeasurement(spark: SparkSession,
                    samples: Seq[SpanSample]): (DataFrame, Seq[String]) = {
    // a resource attr or span attr named like a fixed span column (or
    // like each other) would produce duplicate output columns and break
    // every later by-name resolution for the whole measurement — rename
    // colliders deterministically instead (tag_<k> / attr_<k>)
    val fixed = Set("parent_span_id", "name", "kind", "duration_nano",
      "end_time_unix_nano", "status_code", "status_message", "ts")
    val tagKeys = samples.flatMap(_.tags.keys).distinct.sorted
      .map(k => k -> (if (fixed(k)) s"tag_$k" else k))
    val tagOut = tagKeys.map(_._2).toSet
    val attrKeys = samples.flatMap(_.attrs.keys).distinct.sorted
      .map(k => k -> (if (fixed(k) || tagOut(k)) s"attr_$k" else k))
    val ds = spark.createDataset(samples)(Encoders.product[SpanSample])
    val cols = tagKeys.map { case (k, o) => col("tags").getItem(k).as(o) } ++
      Seq(col("parent_span_id"), col("name"), col("kind"),
        col("duration_nano"), col("end_time_unix_nano"),
        col("status_code"), col("status_message")) ++
      attrKeys.map { case (k, o) => col("attrs").getItem(k).as(o) } :+
      timestamp_millis(expr("time_ns div 1000000")).as("ts")
    (ds.select(cols: _*), tagKeys.map(_._2))
  }

  /** Sender side, for specs: one resource, one scope. */
  def encode(resourceTags: Map[String, String],
             samples: Seq[SpanSample]): Array[Byte] = {
    def kv(k: String, v: String): Array[Byte] = {
      val av = new Writer; av.str(1, v)
      val w = new Writer; w.str(1, k); w.bytes(2, av.result())
      w.result()
    }
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val ss = new Writer
    samples.foreach { s =>
      val span = new Writer
      span.bytes(1, unhex(s.tags("trace_id")))
      span.bytes(2, unhex(s.tags("span_id")))
      if (s.parent_span_id.nonEmpty)
        span.bytes(4, unhex(s.parent_span_id))
      span.str(5, s.name)
      if (s.kind != 0) span.int64(6, s.kind)
      span.fixed64(7, s.time_ns)
      span.fixed64(8, s.end_time_unix_nano)
      s.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
        span.bytes(9, kv(k, v))
      }
      val status = new Writer
      if (s.status_message.nonEmpty) status.str(2, s.status_message)
      if (s.status_code != 0) status.int64(3, s.status_code)
      val st = status.result()
      if (st.nonEmpty) span.bytes(15, st)
      ss.bytes(2, span.result())
    }
    val res = new Writer
    resourceTags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      res.bytes(1, kv(k, v))
    }
    val rs = new Writer
    rs.bytes(1, res.result())
    rs.bytes(2, ss.result())
    val req = new Writer
    req.bytes(1, rs.result())
    req.result()
  }
}
