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

  // ------------------------------------------------------------------
  // Reference-exact fitted Holt-Winters. The model, its initialization,
  // the 2×2×2×2 starting grid (0.3/0.7 on α,β,γ,φ) and the Nelder-Mead
  // simplex it refines with are influxdb's public holt_winters
  // implementation, which the reference ships verbatim
  // (`engine/executor/holt_winters_transform.go`,
  // `lib/util/lifted/influxdb/query/neldermead/neldermead.go` — Hutt's
  // simplex: reflect 1.0, contract 0.5, expand 2.0, ≤1000 iterations,
  // ε=1e-4 on the vertex-value stddev). Two deliberate quirks are kept
  // for numeric identity: the OBJECTIVE clamps its argument in place
  // (the clamp feeds back into the simplex vertices), and the seasonal
  // state aliases the tail of the parameter vector (fit passes mutate
  // it). Multiplicative seasonality, forecasts feed forward during fit.

  private def hwConstrain(x: Array[Double]): Unit = {
    var i = 0
    while (i < 4) {
      if (x(i) > 1) x(i) = 1
      if (x(i) < 0) x(i) = 0
      i += 1
    }
  }

  /** One recursion pass (transform.go:166 `forecast`): phase 0 = fit
    * length (for SSE), phase 1 = fit + h. Mutates `params`. */
  private def hwRefForecast(y: Array[Double], params: Array[Double],
                            seasonal: Boolean, h: Int,
                            phase: Int): Array[Double] = {
    hwConstrain(params)
    var yT = y(0)
    val phi = params(3)
    var lT = params(4)
    var bT = params(5)
    var phiH = phi
    var m = 0
    var so = 0
    if (seasonal) {
      m = params.length - 6
      if (m == 1) params(6) = 1
      so = m - 1
    }
    val out =
      new Array[Double](if (phase == 0) y.length else h + y.length)
    out(0) = yT
    var stm = 1.0
    var stmh = 1.0
    var t = 1
    while (t < out.length) {
      if (seasonal) {
        val hm = t % m
        stm = params(6 + (t - m + so) % m)
        stmh = params(6 + (t - m + hm + so) % m)
      }
      val lTp = lT
      val bTp = bT
      lT = params(0) * (yT / stm) + (1 - params(0)) * (lTp + phi * bTp)
      bT = params(1) * (lT - lTp) + (1 - params(1)) * phi * bTp
      val sT = params(2) * (yT / (lTp + phi * bTp)) +
        (1 - params(2)) * stm
      yT = (lT + phiH * bT) * stmh
      phiH += math.pow(phi, t.toDouble)
      if (seasonal) {
        params(6 + (t + so) % m) = sT
        so += 1
      }
      out(t) = yT
      t += 1
    }
    out
  }

  private def hwRefSse(y: Array[Double], seasonal: Boolean)
                      (params: Array[Double]): Double = {
    val f = hwRefForecast(y, params, seasonal, 0, 0)
    var sse = 0.0
    var i = 0
    while (i < f.length) {
      if (!y(i).isNaN) {
        if (f(i).isNaN) return Double.PositiveInfinity
        val d = f(i) - y(i)
        sse += d * d
      }
      i += 1
    }
    sse
  }

  /** Nelder-Mead simplex, Hutt's formulation — identical control flow
    * to the optimizer the reference lifts from influxdb. */
  private def nelderMead(obj: Array[Double] => Double,
                         start: Array[Double], epsilon: Double,
                         scale: Double): (Double, Array[Double]) = {
    val n = start.length
    val v = Array.ofDim[Double](n + 1, n)
    val f = new Array[Double](n + 1)
    val vr = new Array[Double](n)
    val ve = new Array[Double](n)
    val vc = new Array[Double](n)
    val vm = new Array[Double](n)
    val pn = scale * (math.sqrt((n + 1).toDouble) - 1 + n) /
      (n * math.sqrt(2))
    val qn = scale * (math.sqrt((n + 1).toDouble) - 1) /
      (n * math.sqrt(2))
    var i = 0
    while (i < n) { v(0)(i) = start(i); i += 1 }
    i = 1
    while (i <= n) {
      var j = 0
      while (j < n) {
        v(i)(j) = (if (i - 1 == j) pn else qn) + start(j)
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j <= n) { f(j) = obj(v(j)); j += 1 }
    var itr = 1
    var done = false
    while (itr <= 1000 && !done) {
      var vg = 0
      var vs = 0
      i = 0
      while (i <= n) {
        if (f(i) > f(vg)) vg = i
        if (f(i) < f(vs)) vs = i
        i += 1
      }
      var vh = vs
      i = 0
      while (i <= n) {
        if (f(i) > f(vh) && f(i) < f(vg)) vh = i
        i += 1
      }
      i = 0
      while (i <= n - 1) {
        var cent = 0.0
        var k = 0
        while (k <= n) { if (k != vg) cent += v(k)(i); k += 1 }
        vm(i) = cent / n
        i += 1
      }
      i = 0
      while (i <= n - 1) {
        vr(i) = vm(i) + 1.0 * (vm(i) - v(vg)(i))
        i += 1
      }
      val fr = obj(vr)
      if (fr < f(vh) && fr >= f(vs)) {
        i = 0
        while (i <= n - 1) { v(vg)(i) = vr(i); i += 1 }
        f(vg) = fr
      }
      if (fr < f(vs)) {
        i = 0
        while (i <= n - 1) {
          ve(i) = vm(i) + 2.0 * (vr(i) - vm(i))
          i += 1
        }
        val fe = obj(ve)
        if (fe < fr) {
          i = 0
          while (i <= n - 1) { v(vg)(i) = ve(i); i += 1 }
          f(vg) = fe
        } else {
          i = 0
          while (i <= n - 1) { v(vg)(i) = vr(i); i += 1 }
          f(vg) = fr
        }
      }
      if (fr >= f(vh)) {
        if (fr < f(vg) && fr >= f(vh)) {
          i = 0
          while (i <= n - 1) {
            vc(i) = vm(i) + 0.5 * (vr(i) - vm(i))
            i += 1
          }
        } else {
          i = 0
          while (i <= n - 1) {
            vc(i) = vm(i) - 0.5 * (vm(i) - v(vg)(i))
            i += 1
          }
        }
        val fc = obj(vc)
        if (fc < f(vg)) {
          i = 0
          while (i <= n - 1) { v(vg)(i) = vc(i); i += 1 }
          f(vg) = fc
        } else {
          var row = 0
          while (row <= n) {
            if (row != vs) {
              i = 0
              while (i <= n - 1) {
                v(row)(i) = v(vs)(i) + (v(row)(i) - v(vs)(i)) / 2.0
                i += 1
              }
            }
            row += 1
          }
          f(vg) = obj(v(vg))
          f(vh) = obj(v(vh))
        }
      }
      var fsum = 0.0
      i = 0
      while (i <= n) { fsum += f(i); i += 1 }
      val favg = fsum / (n + 1)
      var s = 0.0
      i = 0
      while (i <= n) { s += math.pow(f(i) - favg, 2.0) / n; i += 1 }
      s = math.sqrt(s)
      if (s < epsilon) done = true
      itr += 1
    }
    var vs = 0
    i = 0
    while (i <= n) { if (f(i) < f(vs)) vs = i; i += 1 }
    val parameters = v(vs).clone()
    val min = obj(v(vs))
    (min, parameters)
  }

  /** y with NaN gaps on the interval grid (transform.go:242
    * `initPoints`; same-bucket duplicates drop). */
  private def hwInitY(pts: Array[(Long, Double)],
                      intervalUs: Long): Array[Double] = {
    val half = intervalUs / 2
    def round(t0: Long): Long = {
      val rem = t0 % intervalUs
      if (rem > half) (t0 / intervalUs + 1) * intervalUs
      else (t0 / intervalUs) * intervalUs
    }
    val buf = scala.collection.mutable.ArrayBuffer[Double](pts(0)._2)
    var t = round(pts(0)._1)
    var i = 1
    while (i < pts.length) {
      val rounded = round(pts(i)._1)
      if (rounded <= t) i += 1
      else {
        t += intervalUs
        while (rounded != t) { buf += Double.NaN; t += intervalUs }
        buf += pts(i)._2
        i += 1
      }
    }
    buf.toArray
  }

  /** holt_winters with fitted parameters — the reference's exact
    * algorithm (see the section comment above). `intervalUs` is the
    * GROUP BY interval; 0 derives the mean step from the data. */
  def holtWintersFit(df: DataFrame, field: String, time: String,
                     tags: Seq[String], h: Int, m: Int = 0,
                     withFit: Boolean = false,
                     intervalUs: Long = 0L): DataFrame =
    run(df, field, time, tags, "hw") { pts =>
      // Emit guard (transform.go:266): season longer than the series,
      // or fewer than 2 points → nothing
      if (m > pts.length || pts.length < 2) Array.empty[(Long, Double)]
      else {
        val interval =
          if (intervalUs > 0) intervalUs
          else math.max(1L,
            (pts.last._1 - pts.head._1) / math.max(1, pts.length - 1))
        val seasonal = m >= 2
        val y = hwInitY(pts, interval)
        // initStartPara (transform.go:276)
        var l0 = 0.0
        if (seasonal) {
          var i = 0
          while (i < m) {
            if (!y(i).isNaN) l0 += (1.0 / m) * y(i)
            i += 1
          }
        } else l0 += 0.5 * y(0)
        var b0 = 0.0
        if (seasonal) {
          var i = 0
          while (i < m && m + i < y.length) {
            if (!y(i).isNaN && !y(m + i).isNaN)
              b0 += 1.0 / (m * m) * (y(m + i) - y(i))
            i += 1
          }
        } else if (!y(1).isNaN) b0 = 0.5 * (y(1) - y(0))
        val s0 =
          if (seasonal)
            Array.tabulate(m)(i => if (!y(i).isNaN) y(i) / l0 else 0.0)
          else Array.empty[Double]
        val sse = hwRefSse(y, seasonal) _
        var minSse = Double.PositiveInfinity
        var best: Array[Double] = null
        var alpha = 0.3
        while (alpha < 1.0) {
          var beta = 0.3
          while (beta < 1.0) {
            var gamma = 0.3
            while (gamma < 1.0) {
              var phi = 0.3
              while (phi < 1.0) {
                val p = new Array[Double](6 + s0.length)
                p(0) = alpha; p(1) = beta; p(2) = gamma; p(3) = phi
                p(4) = l0; p(5) = b0
                System.arraycopy(s0, 0, p, 6, s0.length)
                val (v0, params) = nelderMead(sse, p, 1.0e-4, 1)
                if (v0 < minSse || best == null) {
                  minSse = v0
                  best = params
                }
                phi += 0.4
              }
              gamma += 0.4
            }
            beta += 0.4
          }
          alpha += 0.4
        }
        val fc = hwRefForecast(y, best, seasonal, h, 1)
        var i = 0
        while (i < fc.length) {
          if (fc(i).isNaN || fc(i).isInfinite) fc(i) = 0.0
          i += 1
        }
        if (withFit)
          fc.zipWithIndex.map { case (v0, k) =>
            (pts.head._1 + k * interval, v0)
          }
        else {
          val tail = fc.takeRight(h)
          val start = pts.last._1 + interval
          tail.zipWithIndex.map { case (v0, k) =>
            (start + k * interval, v0)
          }
        }
      }
    }
}
