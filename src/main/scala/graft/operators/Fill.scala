package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `fill(none|null|<value>|previous|linear)` — gap-filling the time spine of
  * a `GROUP BY time(d)` result. Reference: fill transform
  * `engine/executor/fill_transform.go` + bucket clamping
  * `query/compile.go:1325`.
  *
  * Spark-first: generate the spine with `sequence()` + `explode` per series
  * (distributed — the spine is built per tag set on the executors, never on
  * the driver), left-join the aggregated buckets, then
  * `last(ignoreNulls)`/lead-lag interpolation windows. All built-ins
  * (SURVEY §4.3 point 1): no custom Expression needed.
  */
object Fill {

  /** Build the dense (tags × bucket) spine over [startMs, endMs) with the
    * given step, left-joined with `agg` (whose bucket column is `wstart_ms`
    * epoch millis, as produced by WindowedAgg.timeBucket). */
  private def spine(agg: DataFrame, tags: Seq[String],
                    startMs: Long, endMs: Long, stepMs: Long): DataFrame = {
    val series = agg.select(tags.map(col): _*).distinct()
    val spine = series.withColumn("wstart_ms",
      explode(sequence(lit(startMs), lit(endMs - 1), lit(stepMs))))
    spine.join(agg, tags :+ "wstart_ms", "left_outer")
  }

  /** fill(null) / fill(<value>): dense spine, missing buckets null or a
    * constant. */
  def fillValue(agg: DataFrame, valueCols: Seq[String], tags: Seq[String],
                startMs: Long, endMs: Long, stepMs: Long,
                fill: Option[Double] = None): DataFrame = {
    val dense = spine(agg, tags, startMs, endMs, stepMs)
    fill match {
      // cast the fill literal to the column's own type: fill(0) on a
      // BIGINT count column must stay BIGINT, not retype it to double
      case Some(v) => valueCols.foldLeft(dense)((d, c) =>
        d.withColumn(c, coalesce(col(c), lit(v).cast(d.schema(c).dataType))))
      case None => dense
    }
  }

  /** fill(previous): LOCF — last observed value carried forward per series. */
  def fillPrevious(agg: DataFrame, valueCols: Seq[String], tags: Seq[String],
                   startMs: Long, endMs: Long, stepMs: Long): DataFrame = {
    val dense = spine(agg, tags, startMs, endMs, stepMs)
    val w = Window.partitionBy(tags.map(col): _*).orderBy(col("wstart_ms"))
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols.foldLeft(dense)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** fill(linear): interpolate missing buckets between surrounding
    * observations; edges stay null (InfluxQL semantics). */
  def fillLinear(agg: DataFrame, valueCol: String, tags: Seq[String],
                 startMs: Long, endMs: Long, stepMs: Long): DataFrame = {
    val dense = spine(agg, tags, startMs, endMs, stepMs)
    val wAll = Window.partitionBy(tags.map(col): _*).orderBy(col("wstart_ms"))
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = wAll.rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col(valueCol), ignoreNulls = true).over(wPrev)
    val nextV = first(col(valueCol), ignoreNulls = true).over(wNext)
    val prevT = last(when(col(valueCol).isNotNull, col("wstart_ms")),
      ignoreNulls = true).over(wPrev)
    val nextT = first(when(col(valueCol).isNotNull, col("wstart_ms")),
      ignoreNulls = true).over(wNext)
    dense.withColumn(valueCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(prevV.isNotNull && nextV.isNotNull && nextT =!= prevT,
          prevV + (nextV - prevV) * (col("wstart_ms") - prevT) / (nextT - prevT)))
  }
}
