package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `UNNEST(match_all(/regex/, field)) AS(k1, k2…)` — the reference's
  * log-store column extraction (`influxql/ast.go:11905-11940`,
  * `engine/immutable/unnest_func.go:103-115`). openGemini's unnest does NOT
  * multiply rows: each capture group becomes a new column on the same row
  * (empty string when the regex misses) — so the Spark mapping is ONE
  * native [[graft.expressions.RegexpGroups]] match per row fanned out to
  * columns (the reference evaluates its regex once per row too; per-column
  * `regexp_extract` re-ran the full match N times). Narrow, codegen'd,
  * zero-shuffle. */
object Unnest {

  /** Extract capture group i+1 of `pattern` from `field` into `names(i)`.
    * Rows that don't match get empty strings (reference behavior). */
  def matchAll(df: DataFrame, field: String, pattern: String,
               names: Seq[String]): DataFrame = {
    graft.expressions.VectorExpressions.register(df.sparkSession)
    val groupCount = java.util.regex.Pattern.compile(pattern).matcher("")
      .groupCount()
    require(names.length <= groupCount,
      s"UNNEST(match_all): ${names.length} output columns but pattern " +
        s"has only $groupCount capture group(s)")
    val tmp = Iterator.from(0).map(i => s"_graft_rx_groups$i")
      .find(c => !df.columns.contains(c)).get
    val withArr = df.withColumn(tmp,
      call_function("regexp_groups", col(field), lit(pattern)))
    names.zipWithIndex.foldLeft(withArr) { case (d, (name, i)) =>
      d.withColumn(name, col(tmp).getItem(i))
    }.drop(tmp)
  }
}
