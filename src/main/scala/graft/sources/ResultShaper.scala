package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** InfluxQL HTTP result shaping — the reference's final sink
  * (`engine/executor/httpsender_transform.go`: chunks → `models.Rows` →
  * `{"results":[{"series":[{name,tags,columns,values}]}]}`).
  *
  * This runs AFTER all distributed work, on the final (already
  * limited/aggregated) result — the only deliberate collect() in the
  * engine, mirroring the reference where the HTTP sender is a single-node
  * endpoint too. Epoch precision conversion happens here (reference:
  * epoch arg at the HTTP layer, `tests/server_test.go:1515`). */
object ResultShaper {

  /** HTTP `epoch=` parameter → timestamp scaling (reference accepts
    * h/m/s/ms/u/ns, `tests/server_test.go:1515`). Timestamps are µs
    * internally; ns is emitted as µs·1000 (sub-µs digits are zero — the
    * parquet writer precision note in SURVEY §1.2). */
  private def epochOf(ts: java.sql.Timestamp, precision: String): Long = {
    val us = ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    precision match {
      case "h" => us / 3600000000L
      case "m" => us / 60000000L
      case "s" => us / 1000000L
      case "ms" => us / 1000L
      case "u" | "µ" => us
      case "ns" => us * 1000L
      case p => sys.error(s"bad epoch precision: $p")
    }
  }

  /** Go `encoding/json` float64 rendering (`encode.go` floatEncoder):
    * shortest decimal that round-trips, plain 'f' form for
    * 1e-6 ≤ |v| < 1e21, else 'e' form with the `e-0X` → `e-X` cleanup.
    * The reference's every numeric expectation is in this format —
    * `30` not `30.0`, `46.666666666666664` unchanged, `1e+21`. */
  private[sources] def goFloat(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString // reference never emits
    if (d == 0.0) return if (1.0 / d < 0) "-0" else "0"
    val abs = math.abs(d)
    // shortest digit string that round-trips: minimal precision p whose
    // round-to-p-significant-digits value re-parses to the same double
    // (Java 17's Double.toString is not always shortest — JDK-4511638)
    val bd = {
      var p = 1
      var out: java.math.BigDecimal = null
      while (out == null && p <= 17) {
        val c = new java.math.BigDecimal(d)
          .round(new java.math.MathContext(p))
        if (c.doubleValue() == d) out = c
        p += 1
      }
      if (out == null) new java.math.BigDecimal(d) else out
    }
    if (abs >= 1e-6 && abs < 1e21)
      bd.stripTrailingZeros.toPlainString
    else {
      // 'e' form: d.dddde±XX with at least two exponent digits, then
      // Go's json cleanup drops the leading zero of a negative exponent
      val stripped = bd.stripTrailingZeros
      val digits = stripped.unscaledValue.abs.toString
      val sign = if (d < 0) "-" else ""
      val mant =
        if (digits.length == 1) digits
        else digits.head + "." + digits.tail
      val exp = digits.length - 1 - stripped.scale
      val expStr =
        if (exp < 0 && exp > -10) s"e-${-exp}"
        else if (exp < 0) s"e-${-exp}"
        else if (exp < 10) s"e+0$exp"
        else s"e+$exp"
      s"$sign$mant$expStr"
    }
  }

  private def jsonScalar(v: Any, epoch: String = "ms"): String = v match {
    case null => "null"
    case d: Double => goFloat(d)
    case f: Float => goFloat(f.toDouble)
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case ts: java.sql.Timestamp if epoch == "rfc3339" =>
      // the reference's DEFAULT time rendering (no epoch= param):
      // RFC3339 UTC, sub-second digits only when nonzero
      // (`httpd/response_writer.go` time.RFC3339Nano)
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(ts.getTime, 1000L), ts.getNanos.toLong)
      "\"" + java.time.format.DateTimeFormatter.ISO_INSTANT.format(inst) + "\""
    case ts: java.sql.Timestamp => epochOf(ts, epoch).toString
    case d: java.sql.Date => "\"" + d.toString + "\""
    // array cells render as JSON arrays (SHOW SUBSCRIPTIONS destinations —
    // the reference emits the destination list as a JSON array)
    case xs: scala.collection.Seq[_] =>
      xs.map(jsonScalar(_, epoch)).mkString("[", ",", "]")
    case n => n.toString
  }

  /** Chunked form (`chunked=true&chunk_size=n`): each chunk is a complete
    * response document carrying at most `chunkSize` rows of one series;
    * a series split across chunks is marked `"partial":true` on every
    * chunk but its last — the reference's chunking contract
    * (`httpsender_transform.go` chunked emission). Buffered convenience
    * over [[streamSeriesJsonChunked]]. */
  def toSeriesJsonChunked(df: DataFrame, name: String, tagCols: Seq[String],
                          valueCols: Seq[String], chunkSize: Int,
                          epoch: String = "ms"): Seq[String] =
    streamSeriesJsonChunked(df, name, tagCols, valueCols, chunkSize, epoch)
      .toSeq

  /** Streaming chunked emission: rows come off `toLocalIterator` one
    * partition at a time after a series-contiguity sort, so driver
    * memory is bounded by one partition + one chunk REGARDLESS of
    * result size — the reference streams chunks the same way as its
    * cursors advance (`httpsender_transform.go`), and this is what
    * makes `chunked=true` safe for a `SELECT *` over a large
    * measurement. Series are ordered by their stringified tag values;
    * rows within a series keep plan order (the monotonic row-id
    * tiebreaker makes the contiguity sort stable). Tag-less results
    * skip the sort entirely — their plan order IS the emission order. */
  def streamSeriesJsonChunked(df: DataFrame, name: String,
                              tagCols: Seq[String], valueCols: Seq[String],
                              chunkSize: Int,
                              epoch: String = "ms"): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    val projected =
      if (tagCols.isEmpty) df.select(valueCols.map(col): _*)
      else df
        .withColumn("__row", monotonically_increasing_id())
        .orderBy(
          array(tagCols.map(c =>
            coalesce(col(c).cast("string"), lit("null"))): _*).asc,
          col("__row").asc)
        .select((tagCols ++ valueCols).map(col): _*)
    val rows = projected.toLocalIterator().asScala.buffered
    new Iterator[String] {
      def hasNext: Boolean = rows.hasNext
      def next(): String = {
        val key = tagCols.map(t => rows.head.getAs[Any](t))
        val chunk = Vector.newBuilder[Row]
        var n = 0
        while (n < chunkSize && rows.hasNext &&
            tagCols.map(t => rows.head.getAs[Any](t)) == key) {
          chunk += rows.next(); n += 1
        }
        // partial iff the SAME series continues in the next chunk
        val partial = rows.hasNext &&
          tagCols.map(t => rows.head.getAs[Any](t)) == key
        seriesDoc(name, tagCols, key, valueCols, chunk.result(),
          epoch, partial)
      }
    }
  }

  /** `"tags":{…}` member, or NOTHING for an untagged series — the
    * reference omits the key entirely when the series has no tags
    * (`models.Row` json `tags,omitempty`; every untagged expectation in
    * `tests/server_test.go` carries no "tags"). */
  private def tagsField(tagCols: Seq[String], tagVals: Seq[Any]): String =
    if (tagCols.isEmpty) ""
    else tagCols.zip(tagVals)
      .map { case (k, v) => s"${jsonScalar(k)}:${jsonScalar(v)}" }
      .mkString(""","tags":{""", ",", "}")

  private def seriesDoc(name: String, tagCols: Seq[String],
                        tagVals: Seq[Any], valueCols: Seq[String],
                        rs: Seq[Row], epoch: String,
                        partial: Boolean): String = {
    val columns = valueCols.map(c => jsonScalar(c)).mkString("[", ",", "]")
    val values = rs.map(r => valueCols
      .map(c => jsonScalar(r.getAs[Any](c), epoch))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    val p = if (partial) ""","partial":true""" else ""
    s"""{"results":[{"statement_id":0,"series":[{"name":${
      jsonScalar(name)}${tagsField(tagCols, tagVals)},"columns":$columns,"values":$values$p}]}]}"""
  }

  /** Shape a result into the per-series InfluxQL JSON: one series per
    * distinct tag set, `columns` = time + fields, `values` = row arrays.
    * `epoch` is the HTTP API's precision parameter (default ms). */
  def toSeriesJson(df: DataFrame, name: String, tagCols: Seq[String],
                   valueCols: Seq[String], epoch: String = "ms"): String =
    s"""{"results":[${toResultObj(df, name, tagCols, valueCols, epoch)}]}"""

  /** One result object `{"statement_id":i,"series":[…]}` — the unit the
    * reference's response writer emits per statement of a multi-statement
    * `q` (`httpd/response_writer.go:387`).
    *
    * `maxRows` is the reference's `http.max-row-limit`
    * (`httpd/config/config.go:37` DefaultMaxRowNum, truncation per
    * `handler.go:979` getResultRowsCnt): a non-chunked response never
    * buffers more than `maxRows` rows — the series that crosses the
    * limit is cut and marked `"partial":true`, remaining series are
    * dropped. The collect itself is capped at `maxRows + 1` rows so the
    * driver is protected BEFORE shaping, not after. */
  def toResultObj(df: DataFrame, name: String, tagCols: Seq[String],
                  valueCols: Seq[String], epoch: String = "ms",
                  statementId: Int = 0,
                  maxRows: Int = Int.MaxValue): String = {
    val capped =
      if (maxRows == Int.MaxValue) df else df.limit(maxRows + 1)
    val rows = capped.select((tagCols ++ valueCols).map(col): _*).collect()
    val grouped = rows.groupBy(r => tagCols.map(t => r.getAs[Any](t)))
      .toSeq.sortBy(_._1.map(String.valueOf).mkString(","))
    var emitted = 0
    val keptSeries = grouped.iterator
      .takeWhile(_ => emitted < maxRows)
      .map { case (tagVals, rs) =>
        val room = maxRows - emitted
        val (kept, cut) =
          if (rs.length > room) (rs.take(room), true) else (rs, false)
        emitted += kept.length
        (tagVals, kept, cut)
      }.toVector
    // ANY truncation marks partial (handler.go:979): when the limit
    // lands exactly on a series boundary the next whole series is
    // dropped — the sentinel maxRows+1 row proves it — so the LAST
    // emitted series carries the marker even though it wasn't cut mid-way
    val dropped = rows.length > emitted
    val series = keptSeries.zipWithIndex
      .map { case ((tagVals, kept, cut), i) =>
        val partial = cut || (dropped && i == keptSeries.length - 1)
        val columns = valueCols.map(c => jsonScalar(c)).mkString("[", ",", "]")
        val values = kept.map(r => valueCols
          .map(c => jsonScalar(r.getAs[Any](c), epoch))
          .mkString("[", ",", "]")).mkString("[", ",", "]")
        val p = if (partial) ""","partial":true""" else ""
        s"""{"name":${jsonScalar(name)}${tagsField(tagCols, tagVals)},"columns":$columns,"values":$values$p}"""
      }.mkString("[", ",", "]")
    s"""{"statement_id":$statementId,"series":$series}"""
  }
}
