package graft

import org.apache.spark.sql.functions._
import graft.operators.{Fill, SeriesOps, WindowedAgg}

/** Semantics tests on hand-built series (reference behaviors from
  * tests/server_test.go golden cases, re-derived by hand). */
class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  // one series "a": t=0s,10s,30s values 1,4,2 ; one series "b": t=0s v=5
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
  private lazy val df = Seq(
    ("a", ts(0), 1.0, 1L), ("a", ts(10), 4.0, 2L), ("a", ts(30), 2.0, 3L),
    ("b", ts(0), 5.0, 4L)
  ).toDF("tag", "time", "value", "id")

  test("difference: pairwise delta per series") {
    val out = SeriesOps.difference(df, "value", "time", Seq("tag"))
      .select("tag", "difference").as[(String, Double)].collect().sorted
    assert(out.toSeq == Seq(("a", -2.0), ("a", 3.0)))
  }

  test("non_negative_difference drops negatives") {
    val out = SeriesOps.difference(df, "value", "time", Seq("tag"),
      nonNegative = true).select("difference").as[Double].collect()
    assert(out.toSeq == Seq(3.0))
  }

  test("derivative: delta per second") {
    val out = SeriesOps.derivative(df, "value", "time", Seq("tag"))
      .select("derivative").as[Double].collect().sorted
    assert(out.toSeq == Seq(-0.1, 0.3))
  }

  test("elapsed in seconds") {
    val out = SeriesOps.elapsed(df, "time", Seq("tag"))
      .select("elapsed").as[Double].collect().sorted
    assert(out.toSeq == Seq(10.0, 20.0))
  }

  test("moving_average emits only full windows") {
    val out = SeriesOps.movingAverage(df, "value", "time", Seq("tag"), 2)
      .select("moving_average").as[Double].collect().sorted
    assert(out.toSeq == Seq(2.5, 3.0))
  }

  test("cumulative_sum") {
    val out = SeriesOps.cumulativeSum(df, "value", "time", Seq("tag"))
      .filter($"tag" === "a").orderBy("time")
      .select("cumulative_sum").as[Double].collect()
    assert(out.toSeq == Seq(1.0, 5.0, 7.0))
  }

  test("integral: trapezoid area") {
    val out = SeriesOps.integral(df, "value", "time", Seq("tag"))
      .filter($"tag" === "a").select("integral").as[Double].collect()
    // (1+4)/2*10 + (4+2)/2*20 = 25 + 60 = 85
    assert(out.toSeq == Seq(85.0))
  }

  test("rate: (last-first)/span") {
    val out = SeriesOps.rate(df, "value", "time", Seq("tag"))
      .filter($"tag" === "a").select("rate").as[Double].collect()
    assert(out.toSeq == Seq((2.0 - 1.0) / 30.0))
  }

  test("firstLast selectors + spread") {
    val r = SeriesOps.firstLast(df, "value", "time", Seq("tag"))
      .filter($"tag" === "a")
      .select("first", "last", "spread", "n").as[(Double, Double, Double, Long)]
      .collect().head
    assert(r == ((1.0, 2.0, 3.0, 3L)))
  }

  test("topPerSeries keeps aux columns and ranks") {
    val out = SeriesOps.topPerSeries(df, "value", "time", Seq("tag"), 2)
      .filter($"tag" === "a").orderBy("rank_in_series")
      .select("value", "id").as[(Double, Long)].collect()
    assert(out.toSeq == Seq((4.0, 2L), (2.0, 3L)))
  }

  test("limitPerSeries: first n points per series") {
    val out = SeriesOps.limitPerSeries(df, "time", Seq("tag"), 2,
        tieBreak = Seq("id"))
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("slimit limits number of series") {
    val out = SeriesOps.slimit(df, Seq("tag"), 1)
      .select("tag").distinct().as[String].collect()
    assert(out.toSeq == Seq("a"))
  }

  test("slimit with soffset skips leading series") {
    val out = SeriesOps.slimit(df, Seq("tag"), 1, soffset = 1)
      .select("tag").distinct().as[String].collect()
    assert(out.toSeq == Seq("b"))
  }

  test("timeBucket: tumbling windows, partial-aggregated") {
    val out = WindowedAgg.timeBucket(df, "time", "10 seconds", Seq("tag"),
        Seq(sum($"value").as("v")))
      .filter($"tag" === "a").orderBy("wstart_ms")
      .select("wstart_ms", "v").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 1.0), (10000L, 4.0), (30000L, 2.0)))
  }

  test("slidingWindow: points fan out to size/slide windows") {
    val out = WindowedAgg.slidingWindow(df, "time", "20 seconds", "10 seconds",
        Seq("tag"), Seq(count(lit(1)).as("n")))
      .filter($"tag" === "a").orderBy("wstart_ms")
      .select("wstart_ms", "n").as[(Long, Long)].collect()
    // windows starting at -10,0 catch t=0; 0,10 catch t=10; 20,30 catch t=30
    assert(out.toSeq ==
      Seq((-10000L, 1L), (0L, 2L), (10000L, 1L), (20000L, 1L), (30000L, 1L)))
  }

  test("fill previous carries last observation forward") {
    val agg = WindowedAgg.timeBucket(df, "time", "10 seconds", Seq("tag"),
      Seq(sum($"value").as("v"))).select("tag", "wstart_ms", "v")
    val out = Fill.fillPrevious(agg, Seq("v"), Seq("tag"), 0L, 40000L, 10000L)
      .filter($"tag" === "a").orderBy("wstart_ms").select("v")
      .as[Double].collect()
    assert(out.toSeq == Seq(1.0, 4.0, 4.0, 2.0))
  }

  test("fill linear interpolates interior gaps only") {
    val agg = WindowedAgg.timeBucket(df, "time", "10 seconds", Seq("tag"),
      Seq(sum($"value").as("v"))).select("tag", "wstart_ms", "v")
    val out = Fill.fillLinear(agg, "v", Seq("tag"), 0L, 50000L, 10000L)
      .filter($"tag" === "a").orderBy("wstart_ms").select("v")
      .as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(1.0), Some(4.0), Some(3.0), Some(2.0), None))
  }

  test("chunked difference/derivative equal the window forms at any block size") {
    val ev = Tables.table(spark, sf, "events")
      .select($"event_type", $"ts", $"value", $"event_id")
    def rows(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("event_id"), col(c)).as[(Long, Double)].collect().toSet
    val wantD = rows(SeriesOps.difference(ev, "value", "ts",
      Seq("event_type"), tieBreak = Seq("event_id")), "difference")
    // 1-hour blocks (hundreds of boundaries to stitch) and one giant
    // block (degenerates to the plain window path) must both agree
    for (blk <- Seq(3600L * 1000000L, Long.MaxValue / 4)) {
      val got = rows(SeriesOps.differenceChunked(ev, "value", "ts",
        Seq("event_type"), blk, tieBreak = Seq("event_id")), "difference")
      assert(got == wantD, s"difference mismatch at block $blk")
    }
    val wantV = rows(SeriesOps.derivative(ev, "value", "ts",
      Seq("event_type"), tieBreak = Seq("event_id")), "derivative")
    val gotV = rows(SeriesOps.derivativeChunked(ev, "value", "ts",
      Seq("event_type"), 3600L * 1000000L, tieBreak = Seq("event_id")),
      "derivative")
    assert(gotV == wantV)
    // non-negative variant filters the same rows
    val wantNN = rows(SeriesOps.difference(ev, "value", "ts",
      Seq("event_type"), nonNegative = true, tieBreak = Seq("event_id")),
      "difference")
    val gotNN = rows(SeriesOps.differenceChunked(ev, "value", "ts",
      Seq("event_type"), 3600L * 1000000L, nonNegative = true,
      tieBreak = Seq("event_id")), "difference")
    assert(gotNN == wantNN)
  }

  test("fill value substitutes a constant") {
    val agg = WindowedAgg.timeBucket(df, "time", "10 seconds", Seq("tag"),
      Seq(sum($"value").as("v"))).select("tag", "wstart_ms", "v")
    val out = Fill.fillValue(agg, Seq("v"), Seq("tag"), 0L, 40000L, 10000L,
        fill = Some(-1.0))
      .filter($"tag" === "a").orderBy("wstart_ms").select("v")
      .as[Double].collect()
    assert(out.toSeq == Seq(1.0, 4.0, -1.0, 2.0))
  }

  test("asofBackward: inclusive match, per-key isolation, no-match " +
      "null, tolerance horizon") {
    import graft.operators.AsofJoin
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val clicks = Seq((1L, "u1", ts(10000), 1.0), (2L, "u1", ts(5000), 2.0),
        (3L, "u2", ts(7000), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(("u1", ts(5000), 100.0), ("u1", ts(8000), 200.0),
        ("u2", ts(9000), 300.0))
      .toDF("user_id", "ts", "value")
    val out = AsofJoin.asofBackward(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("value"))
      .select($"event_id", $"asof_value",
        unix_millis($"asof_ts").as("ms"))
      .orderBy("event_id")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq((1L, Some(200.0), Some(8000L)),
      (2L, Some(100.0), Some(5000L)), // inclusive at equal ts
      (3L, None, None)), out.toString) // u2's purchase is in the future
    // tolerance: the 2 s horizon keeps t=10000→8000 but a 1 s drops it
    val tight = AsofJoin.asofBackward(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("value"), toleranceMs = Some(1000L))
      .select($"event_id", $"asof_value").orderBy("event_id")
      .as[(Long, Option[Double])].collect().toSeq
    assert(tight == Seq((1L, None), (2L, Some(100.0)), (3L, None)),
      tight.toString)
    // a right ROW with a NULL payload still wins as-of: the match must
    // carry (t=8000, null), not a composite of the newer time with the
    // older row's value — the review-found last(ignoreNulls) trap
    val nullPay = Seq(("u1", ts(5000), Some(100.0)),
        ("u1", ts(8000), Option.empty[Double]))
      .toDF("user_id", "ts", "value")
    val np = AsofJoin.asofBackward(
        clicks.filter($"event_id" === 1), nullPay, Seq("user_id"),
        "ts", "ts", Seq("value"))
      .select($"asof_value", unix_millis($"asof_ts"))
      .as[(Option[Double], Option[Long])].collect().toSeq
    assert(np == Seq((None, Some(8000L))), np.toString)
  }

  test("bandJoin: each in-band pair exactly once, band edges " +
      "inclusive, plan stays equi-join (no nested loop)") {
    import graft.operators.BandJoin
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq((1L, "u1", ts(10000)), (2L, "u1", ts(50000)),
        (3L, "u2", ts(10000)))
      .toDF("lid", "user_id", "ts")
    val r = Seq((101L, "u1", ts(8000)), (102L, "u1", ts(20000)),
        (103L, "u1", ts(21000)), (104L, "u2", ts(10000)))
      .toDF("rid", "user_id", "ts")
    val out = BandJoin.bandJoin(l, r, Seq("user_id"), "ts", "ts",
        bandMs = 10000L)
      .select($"lid", $"r_rid").orderBy("lid", "r_rid")
      .as[(Long, Long)].collect().toSeq
    // lid=1 matches 8000 (Δ2s) and 20000 (Δ10s inclusive) but not
    // 21000 (Δ11s); lid=2 nothing within 10s; lid=3 only its own key
    assert(out == Seq((1L, 101L), (1L, 102L), (3L, 104L)), out.toString)
    val plan = BandJoin.bandJoin(l, r, Seq("user_id"), "ts", "ts",
      10000L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
