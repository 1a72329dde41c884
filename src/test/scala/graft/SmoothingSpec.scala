package graft

import graft.operators.{SeriesOps, Smoothing}

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  // series "a": linear ramp 1..6 at t=0..5 (numeric time)
  private lazy val df = (1 to 6).map(i => ("a", (i - 1).toLong, i.toDouble))
    .toDF("tag", "t", "v")

  test("ema: seeded on first value, recursive blend") {
    val out = Smoothing.ema(df, "v", "t", Seq("tag"), n = 3)
      .orderBy("_t").select("ema").as[Double].collect()
    // alpha = 0.5: 1, 1.5, 2.25, 3.125, 4.0625, 5.03125
    assert(out.toSeq == Seq(1.0, 1.5, 2.25, 3.125, 4.0625, 5.03125))
  }

  test("dema reduces lag vs ema on a ramp") {
    val ema = Smoothing.ema(df, "v", "t", Seq("tag"), 3)
      .orderBy("_t").select("ema").as[Double].collect().last
    val dema = Smoothing.dema(df, "v", "t", Seq("tag"), 3)
      .orderBy("_t").select("dema").as[Double].collect().last
    assert(dema > ema && dema <= 6.5)
  }

  test("rsi: all-gains series pegs at 100") {
    val out = Smoothing.rsi(df, "v", "t", Seq("tag"), n = 3)
      .select("rsi").as[Double].collect()
    assert(out.nonEmpty && out.forall(_ == 100.0))
  }

  test("cmo: pure uptrend = +100") {
    val out = Smoothing.cmo(df, "v", "t", Seq("tag"), n = 3)
      .select("cmo").as[Double].collect()
    assert(out.nonEmpty && out.forall(_ == 100.0))
  }

  test("holt_winters forecasts the linear trend") {
    val out = Smoothing.holtWinters(df, "v", "t", Seq("tag"), h = 2,
        alpha = 0.8, beta = 0.8)
      .orderBy("_t").select("_t", "hw").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(6L, 7L)) // step=1 continuation
    // ramp forecast should continue upward near 7 and 8
    assert(math.abs(out(0)._2 - 7.0) < 0.5 && math.abs(out(1)._2 - 8.0) < 0.7)
  }

  test("holt_winters fit: fitted params never lose to the defaults on " +
      "one-step SSE (noisy trend fixture)") {
    // deterministic "noisy" ramp: i + hash-ish wobble
    val series = (1 to 24).map { i =>
      (i.toLong, i.toDouble + (i * 37 % 5 - 2) * 0.3)
    }
    val noisy = series.map { case (t, v) => ("a", t, v) }
      .toDF("tag", "t", "v")
    val actual = series.toMap
    // in-sample one-step SSE of the emitted fitted values (the fit
    // objective; the grid contains the default (0.5, 0.1), so fitted
    // can never be worse than the fixed defaults)
    def sseOf(rows: Array[(Long, Double)]): Double =
      rows.collect { case (t, p) if actual.contains(t) && t > 1 =>
        val e = p - actual(t); e * e }.sum
    val fixed = Smoothing.holtWinters(noisy, "v", "t", Seq("tag"), h = 1,
        withFit = true)
      .select("_t", "hw").as[(Long, Double)].collect()
    val fitted = Smoothing.holtWintersFit(noisy, "v", "t", Seq("tag"),
        h = 1, withFit = true)
      .select("_t", "hw").as[(Long, Double)].collect()
    assert(fitted.length == series.length + 1)
    assert(sseOf(fitted) <= sseOf(fixed) + 1e-9,
      s"fitted ${sseOf(fitted)} vs fixed ${sseOf(fixed)}")
  }

  test("kama tracks a ramp with high efficiency ratio") {
    val ramp = (1 to 20).map(i => ("a", i.toLong, i.toDouble))
      .toDF("tag", "t", "v")
    val out = Smoothing.kama(ramp, "v", "t", Seq("tag"), n = 5)
      .orderBy("_t").select("_t", "kama").as[(Long, Double)].collect()
    assert(out.length == 15)
    // pure trend → ER = 1 → fast smoothing: kama stays close to the signal
    assert(math.abs(out.last._2 - 20.0) < 2.0)
    assert(out.map(_._2).sliding(2).forall(w => w(0) < w(1))) // monotone
  }

  test("trix of a constant series is zero") {
    val flat = (1 to 10).map(i => ("a", i.toLong, 5.0)).toDF("tag", "t", "v")
    val out = Smoothing.trix(flat, "v", "t", Seq("tag"), n = 3)
      .select("trix").as[Double].collect()
    assert(out.nonEmpty && out.forall(_ == 0.0))
  }

  test("irate uses exactly the last two points") {
    val ts0 = Seq(("a", new java.sql.Timestamp(0L), 10.0, 1L),
      ("a", new java.sql.Timestamp(10000L), 20.0, 2L),
      ("a", new java.sql.Timestamp(15000L), 50.0, 3L))
      .toDF("tag", "time", "v", "id")
    val out = SeriesOps.irate(ts0, "v", "time", Seq("tag"), Seq("id"))
      .select("irate").as[Double].collect()
    assert(out.toSeq == Seq((50.0 - 20.0) / 5.0))
  }
}
