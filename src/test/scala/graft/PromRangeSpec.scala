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
}
