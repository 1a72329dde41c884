package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The sequential-smoothing family — exponential_moving_average,
  * double/triple EMA, relative_strength_index, chande_momentum_oscillator,
  * holt_winters[_with_fit] (reference: validated call set
  * `query/compile.go:441-445,810-816`; holt-winters transform
  * `engine/executor/holt_winters_transform.go`).
  *
  * These recurrences are inherently ordered per series, so the Spark-native
  * shape is `Dataset.groupByKey(tags).flatMapGroups`: one shuffle on the
  * tag key, then a sort+fold of that series in memory — the same state the
  * reference's transform holds (it buffers the series' interval output).
  * Memory per group = points per series; callers aggregate to time buckets
  * first (as InfluxQL does: these calls run over `GROUP BY time(d)` output,
  * bounding points per series by the query's time range / interval).
  */
object Smoothing {

  private def run(df: DataFrame, field: String, time: String,
                  tags: Seq[String], outCol: String)(
      fold: Array[(Long, Double)] => Array[(Long, Double)]): DataFrame = {
    val tcol = df.schema(time).dataType match {
      case TimestampType => unix_micros(col(time))
      case _ => col(time).cast("long")
    }
    val in = df.select(
      (tags.map(col) :+ tcol.as("_t") :+
        col(field).cast("double").as("_v")): _*)
    val outSchema = StructType(
      tags.map(n => in.schema(n)) :+
        StructField("_t", LongType) :+ StructField(outCol, DoubleType))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    in.groupByKey(r => tags.map(n => String.valueOf(r.getAs[Any](n)))
        .mkString("\u0000"))(Encoders.STRING)
      .flatMapGroups { (_, rows) =>
        val buf = rows.toArray
        val tagVals = tags.map(n => buf.head.getAs[Any](n))
        val pts = buf.map(r => (r.getAs[Long]("_t"), r.getAs[Double]("_v")))
          .sortBy(_._1)
        fold(pts).iterator.map { case (t, v) =>
          Row.fromSeq(tagVals :+ t :+ v)
        }
      }
  }

  private def emaSeries(vs: Array[Double], n: Int): Array[Double] = {
    val alpha = 2.0 / (n + 1)
    val out = new Array[Double](vs.length)
    var acc = 0.0
    for (i <- vs.indices) {
      acc = if (i == 0) vs(0) else alpha * vs(i) + (1 - alpha) * acc
      out(i) = acc
    }
    out
  }

  /** exponential_moving_average(f, n): α = 2/(n+1), seeded on the first
    * point, one output per input point. */
  def ema(df: DataFrame, field: String, time: String, tags: Seq[String],
          n: Int): DataFrame =
    run(df, field, time, tags, "ema") { pts =>
      pts.map(_._1).zip(emaSeries(pts.map(_._2), n))
    }

  /** double/triple EMA: DEMA = 2·E1 − E2; TEMA = 3E1 − 3E2 + E3. */
  def dema(df: DataFrame, field: String, time: String, tags: Seq[String],
           n: Int): DataFrame =
    run(df, field, time, tags, "dema") { pts =>
      val e1 = emaSeries(pts.map(_._2), n); val e2 = emaSeries(e1, n)
      pts.indices.map(i => (pts(i)._1, 2 * e1(i) - e2(i))).toArray
    }

  def tema(df: DataFrame, field: String, time: String, tags: Seq[String],
           n: Int): DataFrame =
    run(df, field, time, tags, "tema") { pts =>
      val e1 = emaSeries(pts.map(_._2), n); val e2 = emaSeries(e1, n)
      val e3 = emaSeries(e2, n)
      pts.indices.map(i => (pts(i)._1, 3 * e1(i) - 3 * e2(i) + e3(i))).toArray
    }

  /** kaufmans_adaptive_moving_average(f, n): efficiency-ratio-scaled
    * smoothing constant between fast(2) and slow(30) EMAs. */
  def kama(df: DataFrame, field: String, time: String, tags: Seq[String],
           n: Int): DataFrame =
    run(df, field, time, tags, "kama") { pts =>
      val vs = pts.map(_._2)
      if (vs.length <= n) Array.empty
      else {
        val fastSC = 2.0 / (2 + 1); val slowSC = 2.0 / (30 + 1)
        var acc = vs(n - 1)
        val out = Array.newBuilder[(Long, Double)]
        for (i <- n until vs.length) {
          val change = math.abs(vs(i) - vs(i - n))
          val vol = (i - n + 1 to i).map(j => math.abs(vs(j) - vs(j - 1))).sum
          val er = if (vol == 0) 0.0 else change / vol
          val sc = math.pow(er * (fastSC - slowSC) + slowSC, 2)
          acc = acc + sc * (vs(i) - acc)
          out += ((pts(i)._1, acc))
        }
        out.result()
      }
    }

  /** kaufmans_efficiency_ratio(f, n): |net n-period change| over the sum
    * of |per-step changes| — KAMA's adaptivity input surfaced on its own
    * (the reference validates the call at `query/compile.go:443,812`). */
  def ker(df: DataFrame, field: String, time: String, tags: Seq[String],
          n: Int): DataFrame =
    run(df, field, time, tags, "kaufmans_efficiency_ratio") { pts =>
      val vs = pts.map(_._2)
      if (vs.length <= n) Array.empty
      else (n until vs.length).map { i =>
        val change = math.abs(vs(i) - vs(i - n))
        val vol = (i - n + 1 to i).map(j => math.abs(vs(j) - vs(j - 1))).sum
        (pts(i)._1, if (vol == 0) 0.0 else change / vol)
      }.toArray
    }

  /** triple_exponential_derivative (TRIX): 1-period rate of change of the
    * triple-smoothed EMA, in percent. */
  def trix(df: DataFrame, field: String, time: String, tags: Seq[String],
           n: Int): DataFrame =
    run(df, field, time, tags, "trix") { pts =>
      val e3 = emaSeries(emaSeries(emaSeries(pts.map(_._2), n), n), n)
      (1 until pts.length).flatMap { i =>
        if (e3(i - 1) == 0) None
        else Some((pts(i)._1, 100.0 * (e3(i) - e3(i - 1)) / e3(i - 1)))
      }.toArray
    }

  /** relative_strength_index(f, n): Wilder smoothing of gains/losses. */
  def rsi(df: DataFrame, field: String, time: String, tags: Seq[String],
          n: Int): DataFrame =
    run(df, field, time, tags, "rsi") { pts =>
      val vs = pts.map(_._2)
      if (vs.length <= n) Array.empty
      else {
        var gain = 0.0; var loss = 0.0
        for (i <- 1 to n) {
          val d = vs(i) - vs(i - 1)
          if (d > 0) gain += d else loss -= d
        }
        var avgG = gain / n; var avgL = loss / n
        val out = Array.newBuilder[(Long, Double)]
        def rsiOf(g: Double, l: Double) =
          if (l == 0) 100.0 else 100.0 - 100.0 / (1 + g / l)
        out += ((pts(n)._1, rsiOf(avgG, avgL)))
        for (i <- n + 1 until vs.length) {
          val d = vs(i) - vs(i - 1)
          avgG = (avgG * (n - 1) + math.max(d, 0)) / n
          avgL = (avgL * (n - 1) + math.max(-d, 0)) / n
          out += ((pts(i)._1, rsiOf(avgG, avgL)))
        }
        out.result()
      }
    }

  /** chande_momentum_oscillator(f, n): 100·(sumUp−sumDown)/(sumUp+sumDown)
    * over a sliding n-delta window. */
  def cmo(df: DataFrame, field: String, time: String, tags: Seq[String],
          n: Int): DataFrame =
    run(df, field, time, tags, "cmo") { pts =>
      val vs = pts.map(_._2)
      val deltas = vs.indices.drop(1).map(i => vs(i) - vs(i - 1))
      (n until vs.length).map { i =>
        val w = deltas.slice(i - n, i)
        val up = w.filter(_ > 0).sum; val down = -w.filter(_ < 0).sum
        val v = if (up + down == 0) 0.0 else 100.0 * (up - down) / (up + down)
        (pts(i)._1, v)
      }.toArray
    }

  /** holt_winters[_with_fit](h, m): additive Holt linear trend, optional
    * additive seasonality with period m; forecasts h steps past the series
    * at its mean step. Fixed smoothing params (the reference fits them by
    * Nelder-Mead; we expose them as arguments — same model family, without
    * the stochastic optimizer). withFit=true also emits the fitted values. */
  def holtWinters(df: DataFrame, field: String, time: String,
                  tags: Seq[String], h: Int, m: Int = 0,
                  alpha: Double = 0.5, beta: Double = 0.1,
                  gamma: Double = 0.1,
                  withFit: Boolean = false): DataFrame =
    run(df, field, time, tags, "hw") { pts =>
      hwSeries(pts, h, m, alpha, beta, gamma, withFit)
    }

  /** One Holt-Winters pass over a sorted series; shared by the fixed-param
    * and fitted entry points. Returns (points, one-step-ahead SSE). */
  private def hwPass(pts: Array[(Long, Double)], h: Int, m: Int,
                     alpha: Double, beta: Double, gamma: Double,
                     withFit: Boolean): (Array[(Long, Double)], Double) = {
    val vs = pts.map(_._2)
    if (vs.length < math.max(2, 2 * math.max(m, 1)))
      return (Array.empty, Double.MaxValue)
    val step = if (pts.length > 1)
      (pts.last._1 - pts.head._1) / (pts.length - 1) else 1L
    var level = vs(0)
    var trend = vs(1) - vs(0)
    val season = if (m > 0) {
      val s = new Array[Double](m)
      val mean0 = vs.take(m).sum / m
      for (i <- 0 until m) s(i) = vs(i) - mean0
      s
    } else Array.empty[Double]
    val fit = Array.newBuilder[(Long, Double)]
    var sse = 0.0
    for (i <- vs.indices) {
      val si = if (m > 0) season(i % m) else 0.0
      val pred = level + trend + si
      if (i > 0) { val e = vs(i) - pred; sse += e * e }
      if (withFit) fit += ((pts(i)._1, pred))
      val prevLevel = level
      level = alpha * (vs(i) - si) + (1 - alpha) * (level + trend)
      trend = beta * (level - prevLevel) + (1 - beta) * trend
      if (m > 0) season(i % m) =
        gamma * (vs(i) - level) + (1 - gamma) * si
    }
    val fc = (1 to h).map { k =>
      val si = if (m > 0) season((vs.length + k - 1) % m) else 0.0
      (pts.last._1 + step * k, level + trend * k + si)
    }
    (fit.result() ++ fc, sse)
  }

  private def hwSeries(pts: Array[(Long, Double)], h: Int, m: Int,
                       alpha: Double, beta: Double, gamma: Double,
                       withFit: Boolean): Array[(Long, Double)] =
    hwPass(pts, h, m, alpha, beta, gamma, withFit)._1

  /** holt_winters with fitted parameters — the reference optimizes
    * α/β/γ per series with Nelder-Mead
    * (`engine/executor/holt_winters_transform.go`); here a deterministic
    * grid search minimizes the same objective (one-step-ahead SSE),
    * tie-breaking toward the smallest parameters. The search runs inside
    * the per-series fold, so it distributes exactly like the fixed-param
    * version — ~125 recursion passes over each (bounded) series. */
  def holtWintersFit(df: DataFrame, field: String, time: String,
                     tags: Seq[String], h: Int, m: Int = 0,
                     withFit: Boolean = false): DataFrame =
    run(df, field, time, tags, "hw") { pts =>
      val grid = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      val gammas = if (m > 0) grid else Seq(0.0)
      val best = (for { a <- grid; b <- grid; g <- gammas }
        yield ((a, b, g), hwPass(pts, h, m, a, b, g, withFit = false)._2))
        .minBy { case ((a, b, g), sse) => (sse, a, b, g) }._1
      hwSeries(pts, h, m, best._1, best._2, best._3, withFit)
    }
}
