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

  private def jsonScalar(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case ts: java.sql.Timestamp => ts.getTime.toString // epoch ms
    case d: java.sql.Date => "\"" + d.toString + "\""
    case n => n.toString
  }

  /** Shape a result into the per-series InfluxQL JSON: one series per
    * distinct tag set, `columns` = time + fields, `values` = row arrays. */
  def toSeriesJson(df: DataFrame, name: String, tagCols: Seq[String],
                   valueCols: Seq[String]): String = {
    val rows = df.select((tagCols ++ valueCols).map(col): _*).collect()
    val grouped = rows.groupBy(r => tagCols.map(t => r.getAs[Any](t)))
      .toSeq.sortBy(_._1.map(String.valueOf).mkString(","))
    val series = grouped.map { case (tagVals, rs) =>
      val tags = tagCols.zip(tagVals)
        .map { case (k, v) => s"${jsonScalar(k)}:${jsonScalar(v)}" }
        .mkString("{", ",", "}")
      val columns = valueCols.map(jsonScalar).mkString("[", ",", "]")
      val values = rs.map(r => valueCols.map(c => jsonScalar(r.getAs[Any](c)))
        .mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""{"name":${jsonScalar(name)},"tags":$tags,"columns":$columns,"values":$values}"""
    }.mkString("[", ",", "]")
    s"""{"results":[{"statement_id":0,"series":$series}]}"""
  }
}
