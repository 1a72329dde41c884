package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The castor/castor_ad slot — reference ships each series' window of
  * values to an external Python worker over Arrow for ML
  * (`engine/executor/udaf_functions.go:30` CastorReduce,
  * `services/castor/service.go`) and reads back per-point verdicts.
  *
  * The Spark-native boundary is identical in shape:
  * `groupByKey(series).flatMapGroups(model)` — one series' window in
  * memory at a time, verdicts appended per point. A real deployment swaps
  * the in-JVM detector for `mapInArrow`/`applyInPandas` to an external
  * model (the same Arrow hop the reference uses); the detectors below are
  * deterministic in-JVM baselines so the plumbing is testable here.
  */
object AnomalyDetect {

  /** Rolling z-score detector: point i is anomalous when
    * |x_i − mean(window before i)| > k·stddev(window before i).
    * Emits (tags…, t, value, zscore, is_anomaly). */
  def zscore(df: DataFrame, field: String, time: String, tags: Seq[String],
             window: Int = 20, k: Double = 3.0): DataFrame = {
    val tcol = df.schema(time).dataType match {
      case TimestampType => unix_micros(col(time))
      case _ => col(time).cast("long")
    }
    // NULL samples are dropped, not folded: getAs[Double] would unbox a
    // NULL to 0.0 and poison every window containing it, while SQL
    // window avg/stddev (the oracle) skip NULLs silently.
    val in = df.filter(col(field).isNotNull)
      .select((tags.map(col) :+ tcol.as("_t") :+
        col(field).cast("double").as("_v")): _*)
    val outSchema = StructType(tags.map(n => in.schema(n)) ++ Seq(
      StructField("_t", LongType), StructField("value", DoubleType),
      StructField("zscore", DoubleType), StructField("is_anomaly", BooleanType)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    // NUL separator: space-containing tag values must not collide into one
    // series key (same rule as Smoothing's group key).
    in.groupByKey(r => tags.map(n => String.valueOf(r.getAs[Any](n)))
        .mkString("\u0000"))(Encoders.STRING)
      .flatMapGroups { (_, rows) =>
        val buf = rows.toArray
        val tagVals = tags.map(n => buf.head.getAs[Any](n))
        // (t, v) sort: the v tie-break keeps the fold deterministic if a
        // series ever carries duplicate timestamps (mirrors the oracle's
        // ORDER BY t, v).
        val pts = buf.map(r => (r.getAs[Long]("_t"), r.getAs[Double]("_v")))
          .sortBy(identity)
        pts.indices.iterator.map { i =>
          val lo = math.max(0, i - window)
          val w = pts.slice(lo, i).map(_._2)
          val (z, anom) =
            if (w.length < 3) (0.0, false)
            else {
              val mean = w.sum / w.length
              val sd = math.sqrt(w.map(x => (x - mean) * (x - mean)).sum /
                (w.length - 1))
              // epsilon floor: a deviation from a zero-variance window is
              // maximally anomalous, not invisible
              val zz = (pts(i)._2 - mean) / math.max(sd, 1e-9)
              (zz, math.abs(zz) > k)
            }
          Row.fromSeq(tagVals ++ Seq(pts(i)._1, pts(i)._2, z, anom))
        }
      }
  }
}
