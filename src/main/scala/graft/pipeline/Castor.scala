package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The castor external-model boundary — the reference ships each
  * series' window of samples to an out-of-process Python worker over
  * Arrow and reads back per-point verdicts
  * (`engine/executor/udaf_functions.go:30` CastorReduce,
  * `services/castor/service.go` the worker protocol,
  * `rca.go` root-cause table functions on top of it).
  *
  * [[detect]] is the Spark-native boundary with the same shape:
  * `groupByKey(series).flatMapGroups` hands ONE series' batch at a time
  * to a pluggable [[Model]]. The in-JVM models below make the plumbing
  * testable here; a real deployment swaps the model call for the Arrow
  * hop with NO change to the operator shape.
  *
  * == Arrow contract for a real worker ==
  *
  * A Python/castor worker plugs in as `df.mapInArrow` (or pyspark's
  * `applyInPandas` after `groupBy(tags)`) with this record-batch
  * schema, which is exactly what [[SeriesBatch]] carries:
  *
  *  - IN: one batch per series — columns `tag:<k>` (utf8, constant
  *    within the batch), `t` (int64, epoch µs, ascending), `v`
  *    (float64); batch size = the series' window, matching the
  *    reference's per-window CastorReduce batching.
  *  - OUT: same row count and order — `t` (int64), `v` (float64),
  *    `score` (float64), `flag` (bool).
  *
  * Both directions are append-only columnar batches, so the JVM↔worker
  * copy is zero-transform in Arrow. At 100 TB the boundary stays
  * shuffle-free after the one groupBy(tags) exchange: model calls are
  * per-partition, embarrassingly parallel.
  */
object Castor {

  /** One series crossing the boundary: constant tags + parallel
    * (time, value) arrays sorted by (t, v). */
  case class SeriesBatch(tags: Map[String, String],
                         t: Array[Long], v: Array[Double])

  /** Per-point verdicts, positionally aligned with the input batch. */
  case class Verdicts(score: Array[Double], flag: Array[Boolean])

  /** A pluggable detector. In-JVM here; an Arrow worker in production. */
  type Model = SeriesBatch => Verdicts

  /** The q63 detector as a castor model: rolling z-score over the
    * `window` points before each sample, |z| > k flags (the same math
    * as [[AnomalyDetect.zscore]] — SpecCastor asserts equality). */
  def zscoreModel(window: Int = 20, k: Double = 3.0): Model = batch => {
    val n = batch.t.length
    val score = new Array[Double](n)
    val flag = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val len = i - lo
      if (len >= 3) {
        var sum = 0.0
        var j = lo
        while (j < i) { sum += batch.v(j); j += 1 }
        val mean = sum / len
        var ss = 0.0
        j = lo
        while (j < i) {
          val d = batch.v(j) - mean; ss += d * d; j += 1
        }
        val sd = math.sqrt(ss / (len - 1))
        val z = (batch.v(i) - mean) / math.max(sd, 1e-9)
        score(i) = z
        flag(i) = math.abs(z) > k
      }
      i += 1
    }
    Verdicts(score, flag)
  }

  /** Constant-threshold model (the reference's simplest castor
    * algorithm class): |v| > limit flags, score = v. */
  def thresholdModel(limit: Double): Model = batch =>
    Verdicts(batch.v.clone(), batch.v.map(v => math.abs(v) > limit))

  /** Deployment-flag router: with `GRAFT_CASTOR_PYWORKER=1` the zscore
    * model runs in the out-of-process python worker
    * ([[CastorWorker.pyZscoreModel]], the reference's actual castor
    * topology); otherwise (or when python3 is absent) in-JVM. Both
    * produce identical verdicts — AnomalySpec asserts it. */
  def defaultZscoreModel(window: Int = 20, k: Double = 3.0): Model =
    if (sys.env.get("GRAFT_CASTOR_PYWORKER").contains("1"))
      CastorWorker.pyZscoreModel(window, k)
    else zscoreModel(window, k)

  /** Run `model` over every (tags…) series of `df`. Output columns:
    * tags… ++ (_t, value, zscore, is_anomaly) — the same frame shape as
    * [[AnomalyDetect.zscore]] so the two are drop-in interchangeable. */
  def detect(df: DataFrame, field: String, time: String,
             tags: Seq[String], model: Model): DataFrame = {
    val tcol = df.schema(time).dataType match {
      case TimestampType => unix_micros(col(time))
      case _ => col(time).cast("long")
    }
    // NULL samples are dropped, not folded (AnomalyDetect rationale)
    val in = df.filter(col(field).isNotNull)
      .select((tags.map(col) :+ tcol.as("_t") :+
        col(field).cast("double").as("_v")): _*)
    val outSchema = StructType(tags.map(n => in.schema(n)) ++ Seq(
      StructField("_t", LongType), StructField("value", DoubleType),
      StructField("zscore", DoubleType), StructField("is_anomaly", BooleanType)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    // NUL separator: space-containing tag values must not collide into
    // one series key (same rule as AnomalyDetect/Smoothing)
    in.groupByKey(r => tags.map(n => String.valueOf(r.getAs[Any](n)))
        .mkString("\u0000"))(Encoders.STRING)
      .flatMapGroups { (_, rows) =>
        val buf = rows.toArray
        val tagVals = tags.map(n => buf.head.getAs[Any](n))
        val tagMap = tags.zip(tagVals.map(String.valueOf)).toMap
        val pts = buf.map(r => (r.getAs[Long]("_t"), r.getAs[Double]("_v")))
          .sortBy(identity)
        // the boundary: one columnar batch out, verdicts back
        val batch = SeriesBatch(tagMap, pts.map(_._1), pts.map(_._2))
        val out = model(batch)
        require(out.score.length == pts.length &&
          out.flag.length == pts.length,
          "castor model must return one verdict per input point")
        pts.indices.iterator.map { i =>
          Row.fromSeq(tagVals ++
            Seq(pts(i)._1, pts(i)._2, out.score(i), out.flag(i)))
        }
      }
  }
}
