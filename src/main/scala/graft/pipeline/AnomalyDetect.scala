package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The castor/castor_ad slot — reference ships each series' window of
  * values to an external Python worker over Arrow for ML
  * (`engine/executor/udaf_functions.go:30` CastorReduce,
  * `services/castor/service.go`) and reads back per-point verdicts.
  *
  * The built-in z-score detector is pure window FUNCTIONS — one
  * exchange on the series tags, whole-stage codegen end to end, no
  * object serde (the groupByKey/flatMapGroups boundary lives in
  * [[Castor.detect]] for pluggable models; AnomalySpec proves the two
  * agree to 9 decimal places, the same tolerance the correctness
  * oracle applies).
  */
object AnomalyDetect {

  /** Rolling z-score detector: point i is anomalous when
    * |x_i − mean(window before i)| > k·stddev(window before i).
    * Emits (tags…, _t, value, zscore, is_anomaly). */
  def zscore(df: DataFrame, field: String, time: String, tags: Seq[String],
             window: Int = 20, k: Double = 3.0): DataFrame = {
    val tcol = df.schema(time).dataType match {
      case TimestampType => unix_micros(col(time))
      case _ => col(time).cast("long")
    }
    // NULL samples are dropped, not folded: a NULL inside the frame
    // would poison avg/stddev where the oracle's window funcs skip it.
    val in = df.filter(col(field).isNotNull)
      .select((tags.map(col) :+ tcol.as("_t") :+
        col(field).cast("double").as("_v")): _*)
    // the v tie-break keeps duplicate-timestamp frames deterministic
    // (mirrors the oracle's ORDER BY t, v)
    val win = Window.partitionBy(tags.map(col): _*)
      .orderBy(col("_t"), col("_v"))
      .rowsBetween(-window, -1)
    val cnt = count(col("_v")).over(win)
    val m = avg(col("_v")).over(win)
    val sd = stddev_samp(col("_v")).over(win)
    // epsilon floor: a deviation from a zero-variance window is
    // maximally anomalous, not invisible
    val z = when(cnt < 3, lit(0.0))
      .otherwise((col("_v") - m) / greatest(sd, lit(1e-9)))
    in.select((tags.map(col) :+ col("_t") :+ col("_v").as("value") :+
      z.as("zscore") :+ (abs(z) > k).as("is_anomaly")): _*)
  }
}
