package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

/** Prometheus remote-write ingestion (reference:
  * `lib/util/lifted/influx/httpd/handler_prom.go:86` `servePromWrite`,
  * routed at `handler.go:333` `/api/v1/write` and `handler.go:637`
  * `/api/v1/prom/write`): a snappy-block-compressed protobuf
  * `prompb.WriteRequest` body becomes measurement rows.
  *
  * The wire format is the public Prometheus `remote.proto`/`types.proto`
  * contract:
  * {{{
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }  // ms epoch
  * }}}
  * No protobuf library ships in the allowed dependency set, so this file
  * carries a ~60-line reader/writer for exactly those four messages
  * (varint / fixed64 / length-delimited; unknown fields skipped, so
  * payloads carrying exemplars or metadata still decode).
  *
  * Row mapping mirrors the reference's `timeSeries2Rows`
  * (`httpd/handler_prom_util.go:315`): the `__name__` label selects the
  * measurement (default `prom_metric_not_specified` —
  * `promql2influxql/constant.go:20`), every other label becomes a tag,
  * and the single float field is named `value`
  * (`promql2influxql/constant.go:18`).
  *
  * Two consumption paths:
  *   - [[decode]]/[[toMeasurements]] — the HTTP ingest path: one request
  *     body (small, bounded by the sender's max-samples-per-send) decoded
  *     driver-side, exactly like the reference's single-node handler.
  *   - [[fromPayloads]] — bulk replay at scale: a DataFrame holding many
  *     stored payload blobs (e.g. a Kafka/archive dump read as parquet
  *     binary) is decoded on EXECUTORS via flatMap, so re-ingesting a
  *     100 TB remote-write archive parallelizes per payload with no
  *     driver involvement.
  */
object PromRemoteWrite {

  /** One decoded series: full label set (including `__name__`) plus
    * (epoch-ms, value) samples. */
  case class Series(labels: Map[String, String],
                    samples: Seq[(Long, Double)])

  /** A flattened sample row for the distributed replay path. */
  case class FlatSample(metric: String, labels: Map[String, String],
                        time_ms: Long, value: Double)

  val DefaultMeasurement = "prom_metric_not_specified"
  val MetricLabel = "__name__"

  // --------------------------------------------------------- proto reader
  private[sources] final class Reader(buf: Array[Byte], from: Int, until: Int) {
    var pos: Int = from
    def hasMore: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        if (pos >= until) sys.error("remote write: truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        if (shift > 63) sys.error("remote write: varint overflow")
      }
      out
    }
    def fixed64(): Long = {
      if (pos + 8 > until) sys.error("remote write: truncated fixed64")
      val v = ByteBuffer.wrap(buf, pos, 8)
        .order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }
    /** Returns (fieldNumber, wireType); wireType 2 leaves the length
      * unread — call [[len]] next. */
    def tag(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def len(): Int = {
      val n = varint()
      if (n < 0 || pos + n > until) sys.error("remote write: truncated field")
      n.toInt
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => if (pos + 8 > until) sys.error("remote write: truncated") else pos += 8
      // NOT `pos += len()`: the += desugaring reads `pos` BEFORE len()
      // advances it past the length byte, landing one byte short
      case 2 => val n = len(); pos += n
      case 5 => if (pos + 4 > until) sys.error("remote write: truncated") else pos += 4
      case w => sys.error(s"remote write: unsupported wire type $w")
    }
  }

  private def readLabel(buf: Array[Byte], from: Int, until: Int): (String, String) = {
    val r = new Reader(buf, from, until)
    var name = ""; var value = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); name = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (2, 2) => val n = r.len(); value = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (_, w) => r.skip(w)
    }
    (name, value)
  }

  private def readSample(buf: Array[Byte], from: Int, until: Int): (Long, Double) = {
    val r = new Reader(buf, from, until)
    var ts = 0L; var v = 0.0
    while (r.hasMore) r.tag() match {
      case (1, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
      case (2, 0) => ts = r.varint()
      case (_, w) => r.skip(w)
    }
    (ts, v)
  }

  private[sources] def readTimeSeries(buf: Array[Byte], from: Int, until: Int): Series = {
    val r = new Reader(buf, from, until)
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Long, Double)]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); labels += readLabel(buf, r.pos, r.pos + n); r.pos += n
      case (2, 2) => val n = r.len(); samples += readSample(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    Series(labels.result(), samples.result())
  }

  /** Decode an UNcompressed `WriteRequest`. */
  def decodeUncompressed(buf: Array[Byte]): Seq[Series] = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[Series]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); out += readTimeSeries(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  /** Decode a snappy-block-compressed `WriteRequest` (the on-the-wire
    * remote-write body — `handler_prom.go:331` `snappy.Decode`). */
  def decode(body: Array[Byte]): Seq[Series] =
    decodeUncompressed(Snappy.uncompress(body))

  // --------------------------------------------------------- proto writer
  private[sources] final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); out.write(b, 0, b.length)
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def fixed64(field: Int, v: Long): Unit = {
      tag(field, 1)
      out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v).array(), 0, 8)
    }
    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def result(): Array[Byte] = out.toByteArray
  }

  /** Encode + snappy-compress — the sender side of the protocol (useful
    * for subscription fan-out to a remote-write endpoint, and the spec's
    * round-trip harness). Labels are emitted name-sorted like Prometheus
    * senders do. */
  /** One encoded TimeSeries message (shared with the remote-read
    * response writer). */
  private[sources] def seriesBytes(s: Series): Array[Byte] = {
    val ts = new Writer
    s.labels.toSeq.sortBy(_._1).foreach { case (n, v) =>
      val l = new Writer
      l.str(1, n); l.str(2, v)
      ts.bytes(1, l.result())
    }
    s.samples.foreach { case (t, v) =>
      val smp = new Writer
      smp.fixed64(1, java.lang.Double.doubleToLongBits(v))
      smp.int64(2, t)
      ts.bytes(2, smp.result())
    }
    ts.result()
  }

  def encode(series: Seq[Series]): Array[Byte] = {
    val w = new Writer
    series.foreach(s => w.bytes(1, seriesBytes(s)))
    Snappy.compress(w.result())
  }

  // ------------------------------------------------------------ ingestion
  /** `timeSeries2Rows`: measurement from `__name__`, other labels as
    * tags. */
  def flatten(series: Seq[Series]): Seq[FlatSample] =
    series.flatMap { s =>
      val metric = s.labels.getOrElse(MetricLabel, DefaultMeasurement)
      val tags = s.labels - MetricLabel
      s.samples.map { case (t, v) => FlatSample(metric, tags, t, v) }
    }

  /** Single metric-store frame: ALL series land in ONE measurement named
    * `store`, with `__name__` kept as an ordinary label column — the
    * reference's metric-store write shape (`handler_prom.go:91`
    * servePromWriteWithMetricStore / timeSeries2RowsV2, where the URL's
    * {metric_store} is the target measurement). */
  def toStoreMeasurement(spark: SparkSession, series: Seq[Series],
                         store: String): (DataFrame, Seq[String]) = {
    val rows = series.flatMap(s =>
      s.samples.map { case (t, v) => FlatSample(store, s.labels, t, v) })
    val tagKeys = rows.flatMap(_.labels.keys).distinct.sorted
    val ds = spark.createDataset(rows)(Encoders.product[FlatSample])
    val cols = tagKeys.map(k => col("labels").getItem(k).as(k)) ++
      Seq(col("value"), timestamp_millis(col("time_ms")).as("ts"))
    (ds.select(cols: _*), tagKeys)
  }

  /** One measurement frame per metric name: columns = sorted tag keys ++
    * (`value` DOUBLE, `ts` TIMESTAMP). Returns (df, tagKeys) per metric. */
  def toMeasurements(spark: SparkSession,
                     series: Seq[Series]): Map[String, (DataFrame, Seq[String])] =
    flatten(series).groupBy(_.metric).map { case (metric, rows) =>
      val tagKeys = rows.flatMap(_.labels.keys).distinct.sorted
      val ds = spark.createDataset(rows)(Encoders.product[FlatSample])
      val cols = tagKeys.map(k => col("labels").getItem(k).as(k)) ++
        Seq(col("value"), timestamp_millis(col("time_ms")).as("ts"))
      metric -> (ds.select(cols: _*), tagKeys)
    }

  /** Distributed bulk replay: `binCol` holds whole remote-write bodies
    * (snappy+proto, as archived); each executor partition decodes its
    * payloads independently — the scale path for re-ingesting an archive.
    * Output: `metric STRING, labels MAP<STRING,STRING>, time_ms LONG,
    * value DOUBLE`. */
  def fromPayloads(payloads: DataFrame, binCol: String): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(binCol)).as[Array[Byte]]
      .flatMap(b => flatten(decode(b)))(Encoders.product[FlatSample])
      .toDF()
  }
}

/** Prometheus remote read (`handler_prom.go:303` `servePromRead`, route
  * `handler.go:337` `/api/v1/read`): a snappy+protobuf `ReadRequest`
  * selects series by time range + label matchers; the response is a
  * `ReadResponse` with one `QueryResult` per query. Wire contract
  * (public `remote.proto`):
  * {{{
  *   ReadRequest  { repeated Query queries = 1; }
  *   Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  *                  repeated LabelMatcher matchers = 3; }
  *   LabelMatcher { Type type = 1; string name = 2; string value = 3; }
  *                  // EQ=0 NEQ=1 RE=2 NRE=3
  *   ReadResponse { repeated QueryResult results = 1; }
  *   QueryResult  { repeated TimeSeries timeseries = 1; }
  * }}}
  */
object PromRemoteRead {
  import PromRemoteWrite.{Reader, Series, Writer}

  /** `type`: 0 EQ, 1 NEQ, 2 RE, 3 NRE (prompb LabelMatcher.Type). */
  case class Matcher(typ: Int, name: String, value: String) {
    def matches(v: String): Boolean = typ match {
      case 0 => v == value
      case 1 => v != value
      case 2 => ("^(?:" + value + ")$").r.matches(v)
      case 3 => !("^(?:" + value + ")$").r.matches(v)
      case t => sys.error(s"remote read: unknown matcher type $t")
    }
  }
  case class Query(startMs: Long, endMs: Long, matchers: Seq[Matcher])

  private def readMatcher(buf: Array[Byte], from: Int, until: Int): Matcher = {
    val r = new Reader(buf, from, until)
    var typ = 0; var name = ""; var value = ""
    while (r.hasMore) r.tag() match {
      case (1, 0) => typ = r.varint().toInt
      case (2, 2) => val n = r.len(); name = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (3, 2) => val n = r.len(); value = new String(buf, r.pos, n, "UTF-8"); r.pos += n
      case (_, w) => r.skip(w)
    }
    Matcher(typ, name, value)
  }

  private def readQuery(buf: Array[Byte], from: Int, until: Int): Query = {
    val r = new Reader(buf, from, until)
    var lo = 0L; var hi = 0L
    val ms = Seq.newBuilder[Matcher]
    while (r.hasMore) r.tag() match {
      case (1, 0) => lo = r.varint()
      case (2, 0) => hi = r.varint()
      case (3, 2) => val n = r.len(); ms += readMatcher(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    Query(lo, hi, ms.result())
  }

  /** Decode a snappy-compressed `ReadRequest` body. */
  def decodeRequest(body: Array[Byte]): Seq[Query] = {
    val buf = org.xerial.snappy.Snappy.uncompress(body)
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[Query]
    while (r.hasMore) r.tag() match {
      case (1, 2) => val n = r.len(); out += readQuery(buf, r.pos, r.pos + n); r.pos += n
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  /** Encode a `ReadResponse` (one QueryResult per inner Seq), snappy
    * compressed like the reference's responder. */
  def encodeResponse(results: Seq[Seq[Series]]): Array[Byte] = {
    val w = new Writer
    results.foreach { qr =>
      val q = new Writer
      qr.foreach(s => q.bytes(1, PromRemoteWrite.seriesBytes(s)))
      w.bytes(1, q.result())
    }
    org.xerial.snappy.Snappy.compress(w.result())
  }

  /** Decode a snappy-compressed `ReadResponse` (client side / specs). */
  def decodeResponse(body: Array[Byte]): Seq[Seq[Series]] = {
    val buf = org.xerial.snappy.Snappy.uncompress(body)
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[Seq[Series]]
    while (r.hasMore) r.tag() match {
      case (1, 2) =>
        val n = r.len(); val until = r.pos + n
        val qr = new Reader(buf, r.pos, until)
        val ss = Seq.newBuilder[Series]
        while (qr.hasMore) qr.tag() match {
          case (1, 2) =>
            val m = qr.len()
            ss += PromRemoteWrite.readTimeSeries(buf, qr.pos, qr.pos + m)
            qr.pos += m
          case (_, w) => qr.skip(w)
        }
        out += ss.result(); r.pos = until
      case (_, w) => r.skip(w)
    }
    out.result()
  }
}
