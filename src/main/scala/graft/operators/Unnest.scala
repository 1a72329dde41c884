package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `UNNEST(match_all(/regex/, field)) AS(k1, k2…)` — the reference's
  * log-store column extraction (`influxql/ast.go:11905-11940`,
  * `engine/immutable/unnest_func.go:103-115`). openGemini's unnest does NOT
  * multiply rows: each capture group becomes a new column on the same row
  * (empty string when the regex misses) — so the Spark mapping is N
  * `regexp_extract` projections, not a generator. Narrow, codegen'd,
  * zero-shuffle. */
object Unnest {

  /** Extract capture group i+1 of `pattern` from `field` into `names(i)`.
    * Rows that don't match get empty strings (reference behavior). */
  def matchAll(df: DataFrame, field: String, pattern: String,
               names: Seq[String]): DataFrame =
    names.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      d.withColumn(name, regexp_extract(col(field), pattern, i + 1))
    }
}
