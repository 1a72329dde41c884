package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL label/time/histogram functions — reference:
  * `engine/executor/label_functions.go:25-26`,
  * `prom_time_functions.go:25-36`, histogram_quantile in the prom agg set
  * (`agg_operators.go`). All column math, no UDFs. */
object PromFunctions {

  /** label_replace(dst, replacement, src, regex): only rows whose src
    * matches get the rewritten dst (PromQL leaves the rest unchanged —
    * here: dst keeps its old value / null). */
  def labelReplace(df: DataFrame, dst: String, replacement: String,
                   src: String, regex: String): DataFrame = {
    // Prometheus anchors the match to the WHOLE src value (^(?:re)$) and
    // substitutes once — an unanchored global replace would both match
    // substrings and re-expand on the trailing empty match of patterns
    // like `(.*)`, yielding "c-x-x" for "c".
    val anchored = s"^(?:$regex)$$"
    df.withColumn(dst,
      when(col(src).rlike(anchored),
          regexp_replace(col(src), anchored, replacement))
        .otherwise(if (df.columns.contains(dst)) col(dst) else lit(null)))
  }

  /** label_join(dst, sep, srcLabels…). */
  def labelJoin(df: DataFrame, dst: String, sep: String,
                srcLabels: Seq[String]): DataFrame =
    df.withColumn(dst, concat_ws(sep, srcLabels.map(col): _*))

  /** Prom time functions over a timestamp column (UTC session). `dow` is
    * 0=Sunday (PromQL day_of_week). */
  def timeParts(ts: Column): Seq[(String, Column)] = Seq(
    "year" -> year(ts).cast("long"),
    "month" -> month(ts).cast("long"),
    "day_of_month" -> dayofmonth(ts).cast("long"),
    "day_of_week" -> (dayofweek(ts) - 1).cast("long"),
    "hour" -> hour(ts).cast("long"),
    "minute" -> minute(ts).cast("long"),
    "days_in_month" -> dayofmonth(last_day(ts)).cast("long"))

  /** histogram_quantile(q) over cumulative le-buckets.
    * Input: one row per (labels…, le) with the cumulative count in
    * `value`; the +Inf bucket must be present (Double.MaxValue works).
    * Output: one row per label set with the interpolated quantile.
    *
    * Upstream `bucketQuantile` semantics (Prometheus quantile.go, the
    * contract the histograms corpus replays): q < 0 → −Inf, q > 1 →
    * +Inf; a rank landing in the +Inf bucket returns the last FINITE
    * upper bound; the first bucket interpolates from 0 only when its
    * upper bound is positive, else returns the upper bound (lower
    * bound of a negative first bucket is unknowable, not 0). */
  def histogramQuantile(df: DataFrame, q: Double, labels: Seq[String],
                        le: String = "le",
                        value: String = "value"): DataFrame = {
    if (q.isNaN || q < 0 || q > 1) {
      val v =
        if (q.isNaN) Double.NaN
        else if (q < 0) Double.NegativeInfinity
        else Double.PositiveInfinity
      return df.groupBy(labels.map(col): _*)
        .agg(lit(v).as("quantile"))
        .select((labels.map(col) :+ col("quantile")): _*)
    }
    val wAll = Window.partitionBy(labels.map(col): _*)
    val wOrd = wAll.orderBy(col(le))
    val target = lit(q) * max(col(value)).over(wAll)
    val prevLe = lag(col(le), 1).over(wOrd)
    val prevV = lag(col(value), 1).over(wOrd)
    val staged = df
      .withColumn("_target", target)
      .withColumn("_prev_le", prevLe)
      .withColumn("_prev_v", prevV)
      .filter(col(value) >= col("_target"))
    val first = Window.partitionBy(labels.map(col): _*).orderBy(col(le))
    staged.withColumn("_rn", row_number().over(first))
      .filter(col("_rn") === 1)
      .withColumn("quantile", coalesce(
        // rank in the +Inf bucket → last finite upper bound; a lone
        // +Inf bucket (no finite buckets) coalesces to NaN
        when(col(le) >= lit(Double.MaxValue), col("_prev_le"))
          // first bucket: zero-anchored only for a positive upper bound
          .when(col("_prev_v").isNull && col(le) <= 0, col(le))
          .when(col("_prev_v").isNull,
            col(le) * col("_target") / col(value))
          .otherwise(col("_prev_le") +
            (col(le) - col("_prev_le")) *
              (col("_target") - col("_prev_v")) /
              (col(value) - col("_prev_v"))),
        lit(Double.NaN)))
      .select((labels.map(col) :+ col("quantile")): _*)
  }
}
