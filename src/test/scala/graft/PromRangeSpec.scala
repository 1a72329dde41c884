package graft

import java.sql.Timestamp
import graft.operators.PromRange

class PromRangeSpec extends SparkSpec {
  import spark.implicits._

  // one series: values 1, 5, 3, 3, 7 at t = 10,20,30,40,50 min
  private lazy val df = Seq(1.0, 5.0, 3.0, 3.0, 7.0).zipWithIndex.map {
    case (v, i) => ("a", new Timestamp((i + 1) * 600000L), v)
  }.toDF("job", "time", "value")

  test("over_time aggregates per range window") {
    val out = PromRange.overTime(df, "time", "value", Seq("job"),
        range = "30 minutes", step = "30 minutes")
      .orderBy("eval_ms")
      .select("eval_ms", "count_ot", "sum_ot", "min_ot", "max_ot", "delta")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    // window (0,30]: values 1,5 (t=10,20)... window boundaries [0,30) actually:
    // Spark window(30m,30m) → [0,30): t=10,20 ; [30,60): t=30,40,50
    assert(out.length == 2)
    assert(out(0) == ((1800000L, 2L, 6.0, 1.0, 5.0, 4.0)))
    assert(out(1) == ((3600000L, 3L, 13.0, 3.0, 7.0, 4.0)))
  }

  test("rate is per-second over the observed span") {
    val out = PromRange.overTime(df, "time", "value", Seq("job"),
        range = "50 minutes", step = "50 minutes")
      .orderBy("eval_ms").select("rate").as[Option[Double]].collect()
    // [0,50m): t=10..40 → (3-1)/(1800s) ; [50,100m): single point → null
    assert(out(0).contains((3.0 - 1.0) / 1800.0))
    assert(out(1).isEmpty)
  }

  test("changes and resets count value transitions in order") {
    val out = PromRange.changesResets(df, "time", "value", Seq("job"),
        range = "1 hour", step = "1 hour")
      .select("changes", "resets").as[(Long, Long)].collect().head
    // series 1→5→3→3→7: changes = 3 (1→5, 5→3, 3→7), resets = 1 (5→3)
    assert(out == ((3L, 1L)))
  }

  test("counterRate: Prometheus reset accumulation + boundary " +
      "extrapolation, hand-computed") {
    // counter 0,10,20,5,15 at t=10..50min in a [0,60m) window: one reset
    // (20→5). rawInc = (15-0) + 20 = 35. span=2400s, avgDur=600s,
    // thresh=660s. durStart=600<660 → keep 600; but counter zero-cap:
    // durZero = 2400*(0/35)=0 < 600 → durStart=0. durEnd=600<660 → 600.
    // extrap=(2400+0+600)/2400=1.25 → increase=43.75, rate=43.75/3600.
    val cdf = Seq(0.0, 10.0, 20.0, 5.0, 15.0).zipWithIndex.map {
      case (v, i) => ("a", new Timestamp((i + 1) * 600000L), v, i.toLong)
    }.toDF("job", "time", "value", "id")
    val out = PromRange.counterRate(cdf, "time", "value", Seq("job"),
        range = "60 minutes", step = "60 minutes", tieBreak = Seq("id"))
      .orderBy("eval_ms")
      .select("n", "increase", "rate", "delta", "irate", "idelta")
      .as[(Long, Double, Double, Double, Double, Double)].collect()
    val first = out.head
    assert(first._1 == 5L)
    assert(first._2 == 35.0 * 1.25)             // increase
    assert(first._3 == 35.0 * 1.25 / 3600.0)    // rate
    // delta (gauge): rawDelta=15, durStart=600 (no zero cap) →
    // extrap=(2400+600+600)/2400=1.5 → 22.5
    assert(first._4 == 15.0 * 1.5)
    // last two samples 5→15: idelta=10, irate=10/600s
    assert(first._6 == 10.0 && first._5 == 10.0 / 600.0)
  }

  test("counterRate: reset in the last pair makes irate use the raw value") {
    // counter ...,30,2: reset at the end → irate = 2/dt, idelta = -28
    val cdf = Seq(10.0, 30.0, 2.0).zipWithIndex.map {
      case (v, i) => ("a", new Timestamp((i + 1) * 600000L), v, i.toLong)
    }.toDF("job", "time", "value", "id")
    val out = PromRange.counterRate(cdf, "time", "value", Seq("job"),
        range = "60 minutes", step = "60 minutes", tieBreak = Seq("id"))
      .select("irate", "idelta").as[(Double, Double)].collect().head
    assert(out == ((2.0 / 600.0, -28.0)))
  }

  test("linearRegression: exact slope and extrapolation on a ramp") {
    // v = t_minutes at t=10,20,30min in a [0,60m) window: slope = 1/min
    val cdf = Seq(10.0, 20.0, 30.0).zipWithIndex.map { case (v, i) =>
      ("a", new Timestamp((i + 1) * 600000L), v)
    }.toDF("job", "time", "value")
    val out = PromRange.linearRegression(cdf, "time", "value", Seq("job"),
        range = "60 minutes", step = "60 minutes", predictSeconds = 600.0)
      .select("n", "deriv", "predict")
      .as[(Long, Double, Double)].collect().head
    assert(out._1 == 3L)
    assert(math.abs(out._2 - 1.0 / 60.0) < 1e-6)      // per-second slope
    // regression value at window end + 10min = v(70min) = 70
    assert(math.abs(out._3 - 70.0) < 1e-3)
  }

  test("counterRate drops windows with <2 samples") {
    val cdf = Seq(("a", new Timestamp(600000L), 1.0, 0L))
      .toDF("job", "time", "value", "id")
    assert(PromRange.counterRate(cdf, "time", "value", Seq("job"),
      "60 minutes", "60 minutes", Seq("id")).count() == 0)
  }

  test("statsOverTime: stddev/stdvar/quantile/mad by hand") {
    // 1,2,3,4 inside one (0,60m] window
    val cdf = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      ("a", new Timestamp((i + 1) * 600000L), v)
    }.toDF("job", "time", "value")
    val out = PromRange.statsOverTime(cdf, "time", "value", Seq("job"),
        range = "60 minutes", step = "60 minutes", phi = Some(0.25),
        inclusiveEnd = true)
      .select("stdvar_ot", "stddev_ot", "mad_ot", "quantile_ot")
      .as[(Double, Double, Double, Double)].collect().head
    assert(out._1 == 1.25)                       // Σ(x−2.5)²/4
    assert(math.abs(out._2 - math.sqrt(1.25)) < 1e-12)
    assert(out._3 == 1.0)   // devs 1.5,.5,.5,1.5 → median .5+.5·(1.5−.5)
    assert(out._4 == 1.75)  // rank .25·3 = .75 → 1 + .75·(2−1)
  }

  test("quantile_over_time φ outside [0,1] yields ±Inf") {
    val cdf = Seq(("a", new Timestamp(600000L), 1.0))
      .toDF("job", "time", "value")
    def q(p: Double) = PromRange.statsOverTime(cdf, "time", "value",
        Seq("job"), "60 minutes", "60 minutes", phi = Some(p),
        inclusiveEnd = true)
      .select("quantile_ot").as[Double].collect().head
    assert(q(-0.5).isNegInfinity)
    assert(q(1.5).isPosInfinity)
    assert(q(1.0) == 1.0)
  }
}
