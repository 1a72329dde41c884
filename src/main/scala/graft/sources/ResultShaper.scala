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

  private def jsonScalar(v: Any, epoch: String = "ms"): String = v match {
    case null => "null"
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
    case n => n.toString
  }

  /** Chunked form (`chunked=true&chunk_size=n`): each chunk is a complete
    * response document carrying at most `chunkSize` rows of one series;
    * a series split across chunks is marked `"partial":true` on every
    * chunk but its last — the reference's chunking contract
    * (`httpsender_transform.go` chunked emission). The driver-facing
    * collect stays the single deliberate one; chunking just segments the
    * already-final rows. */
  def toSeriesJsonChunked(df: DataFrame, name: String, tagCols: Seq[String],
                          valueCols: Seq[String], chunkSize: Int,
                          epoch: String = "ms"): Seq[String] = {
    val rows = df.select((tagCols ++ valueCols).map(col): _*).collect()
    val grouped = rows.groupBy(r => tagCols.map(t => r.getAs[Any](t)))
      .toSeq.sortBy(_._1.map(String.valueOf).mkString(","))
    grouped.flatMap { case (tagVals, rs) =>
      val tags = tagCols.zip(tagVals)
        .map { case (k, v) => s"${jsonScalar(k)}:${jsonScalar(v)}" }
        .mkString("{", ",", "}")
      val columns = valueCols.map(c => jsonScalar(c)).mkString("[", ",", "]")
      val chunks = rs.grouped(chunkSize).toSeq
      chunks.zipWithIndex.map { case (chunk, i) =>
        val values = chunk.map(r => valueCols
          .map(c => jsonScalar(r.getAs[Any](c), epoch))
          .mkString("[", ",", "]")).mkString("[", ",", "]")
        val partial = if (i < chunks.size - 1) ""","partial":true""" else ""
        s"""{"results":[{"statement_id":0,"series":[{"name":${
          jsonScalar(name)},"tags":$tags,"columns":$columns,"values":$values$partial}]}]}"""
      }
    }
  }

  /** Shape a result into the per-series InfluxQL JSON: one series per
    * distinct tag set, `columns` = time + fields, `values` = row arrays.
    * `epoch` is the HTTP API's precision parameter (default ms). */
  def toSeriesJson(df: DataFrame, name: String, tagCols: Seq[String],
                   valueCols: Seq[String], epoch: String = "ms"): String =
    s"""{"results":[${toResultObj(df, name, tagCols, valueCols, epoch)}]}"""

  /** One result object `{"statement_id":i,"series":[…]}` — the unit the
    * reference's response writer emits per statement of a multi-statement
    * `q` (`httpd/response_writer.go:387`). */
  def toResultObj(df: DataFrame, name: String, tagCols: Seq[String],
                  valueCols: Seq[String], epoch: String = "ms",
                  statementId: Int = 0): String = {
    val rows = df.select((tagCols ++ valueCols).map(col): _*).collect()
    val grouped = rows.groupBy(r => tagCols.map(t => r.getAs[Any](t)))
      .toSeq.sortBy(_._1.map(String.valueOf).mkString(","))
    val series = grouped.map { case (tagVals, rs) =>
      val tags = tagCols.zip(tagVals)
        .map { case (k, v) => s"${jsonScalar(k)}:${jsonScalar(v)}" }
        .mkString("{", ",", "}")
      val columns = valueCols.map(c => jsonScalar(c)).mkString("[", ",", "]")
      val values = rs.map(r => valueCols
        .map(c => jsonScalar(r.getAs[Any](c), epoch))
        .mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""{"name":${jsonScalar(name)},"tags":$tags,"columns":$columns,"values":$values}"""
    }.mkString("[", ",", "]")
    s"""{"statement_id":$statementId,"series":$series}"""
  }
}
