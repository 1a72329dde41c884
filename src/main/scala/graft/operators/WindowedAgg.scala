package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `GROUP BY <tags>, time(interval[, offset])` — the core openGemini query
  * shape (reference: stream agg `engine/executor/agg_transform.go`, hash agg
  * `hash_agg_transform.go`, window options `query/select.go:579`).
  *
  * Spark-first: `groupBy(tags, window(time, interval))` — Catalyst plans a
  * partial (map-side) aggregate before the shuffle and a final aggregate
  * after, which is exactly the reference's AggPushdown/AggSpread rule pair
  * (`heu_rule.go:259,602`) for free. At 100 TB the shuffle carries only
  * one partial row per (tags × window) per input partition.
  */
object WindowedAgg {

  /** Tumbling-window aggregation. `bucketExpr` time column name; windows are
    * emitted as their start epoch-millis (`wstart_ms`) so results round-trip
    * through any engine without timestamp-precision skew (openGemini time is
    * int64 ns; Spark timestamps are µs — SURVEY §1.2).
    *
    * `offset` shifts the bucket grid (`GROUP BY time(d, offset)`,
    * reference ast.go:2160 window offset); `tz` evaluates bucket
    * boundaries in a named zone (the `tz()` clause): the time column is
    * converted to local wall-clock for assignment and the emitted
    * `wstart_ms` converts the local boundary back to an absolute epoch. */
  def timeBucket(df: DataFrame, time: String, interval: String,
                 tags: Seq[String], aggs: Seq[Column],
                 offset: String = "0 seconds",
                 tz: Option[String] = None): DataFrame = {
    val tcol = tz.map(z => from_utc_timestamp(col(time), z))
      .getOrElse(col(time))
    // Arithmetic tumbling bucket — floor((t − off)/size)·size + off in µs
    // (pmod keeps floor semantics for pre-1970 epochs), identical
    // assignment to Spark's `window(t, d, d, off)` but WITHOUT the
    // per-row window-struct construction and the struct grouping key:
    // the shuffle hashes one LONG instead of a struct of two
    // timestamps, and the hot projection is two integer ops.
    val sizeUs = fixedUs(interval)
    val offUs = fixedUs(offset)
    require(sizeUs > 0, s"bucket interval must be positive: $interval")
    val rel = unix_micros(tcol) - lit(offUs)
    val startUs = (rel - pmod(rel, lit(sizeUs)) + lit(offUs))
      .as("_wstart_us")
    val grouped = df.groupBy(startUs +: tags.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val wstartLocal = timestamp_micros(col("_wstart_us"))
    val wstart = tz.map(z => to_utc_timestamp(wstartLocal, z))
      .getOrElse(wstartLocal)
    grouped.withColumn("wstart_ms", unix_millis(wstart))
      .drop("_wstart_us")
  }

  /** Fixed-length interval in µs; calendar-varying (month) intervals are
    * rejected, the same restriction Spark's `window()` imposes. */
  private def fixedUs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"calendar-varying interval unsupported: $s")
    iv.days * 86400000000L + iv.microseconds
  }

  /** EXCEPT/`without` dimensions: group by every tag except the listed
    * ones (reference `SelectStatement.ExceptDimensions` ast.go:2118,
    * PromQL `without`). */
  def timeBucketWithout(df: DataFrame, time: String, interval: String,
                        allTags: Seq[String], except: Seq[String],
                        aggs: Seq[Column]): DataFrame =
    timeBucket(df, time, interval, allTags.filterNot(except.contains), aggs)

  /** sliding_window(agg, size, slide): each point contributes to
    * size/slide overlapping windows. Reference:
    * `engine/executor/sliding_window_transform.go:60`. Spark's `window()`
    * with a slide duplicates rows into their windows *before* the partial
    * aggregate — still one shuffle, fan-out bounded by size/slide. */
  def slidingWindow(df: DataFrame, time: String, size: String, slide: String,
                    tags: Seq[String], aggs: Seq[Column]): DataFrame = {
    // arithmetic fan-out (PromRange.withRangeWindow shape): a sample at
    // t joins windows [k·slide, k·slide+size) for
    // k ∈ [⌊(t−size)/slide⌋+1, ⌊t/slide⌋] — the expanded column is one
    // LONG instead of window()'s per-projection window-struct expression
    val sizeUs = fixedUs(size); val slideUs = fixedUs(slide)
    require(sizeUs > 0 && slideUs > 0, s"bad window $size / $slide")
    val tu = unix_micros(col(time))
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(slideUs))) / lit(slideUs)).cast("long")
    val kmin = floorDiv(tu - lit(sizeUs)) + 1
    val kmax = floorDiv(tu)
    val ks = when(kmax >= kmin, sequence(kmin, kmax))
      .otherwise(array().cast("array<bigint>"))
    df.withColumn("_k", explode(ks))
      .groupBy(col("_k") +: tags.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("wstart_ms",
        unix_millis(timestamp_micros(col("_k") * lit(slideUs))))
      .drop("_k")
  }
}
