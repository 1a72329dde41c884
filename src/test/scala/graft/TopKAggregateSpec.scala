package graft

import org.apache.spark.sql.functions._

import graft.operators.SeriesOps

/** The bounded top-k aggregate must agree exactly with a full sort —
  * across many input partitions, so the partial/merge/serialize path of
  * the TypedImperativeAggregate is really exercised. */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 1000).map { i =>
    (s"g${i % 7}", i.toLong, (i * 37 % 1000).toDouble, s"p$i")
  }.toDF("tag", "time", "value", "aux").repartition(13)

  test("topPerSeries(agg) equals the window-rank ground truth") {
    val got = SeriesOps.topPerSeries(df, "value", "time", Seq("tag"), 5)
      .select("tag", "rank_in_series", "value", "time", "aux")
      .orderBy("tag", "rank_in_series")
      .as[(String, Int, Double, Long, String)].collect().toSeq
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"tag").orderBy($"value".desc, $"time".asc)
      df.withColumn("rank_in_series", row_number().over(w))
        .filter($"rank_in_series" <= 5)
        .select("tag", "rank_in_series", "value", "time", "aux")
        .orderBy("tag", "rank_in_series")
        .as[(String, Int, Double, Long, String)].collect().toSeq
    }
    assert(got == want)
  }

  test("bottom selects the other end, ties broken by time asc") {
    val tied = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
      ("a", 4L, 9.0)).toDF("tag", "time", "value").repartition(3)
    val got = SeriesOps.topPerSeries(tied, "value", "time", Seq("tag"), 2,
        bottom = true)
      .select("rank_in_series", "time", "value")
      .orderBy("rank_in_series").as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((1, 1L, 5.0), (2, 2L, 5.0)))
  }

  test("global top (no tags) over many partitions") {
    val got = SeriesOps.topPerSeries(df, "value", "time", Nil, 3)
      .select("value", "time").orderBy($"rank_in_series")
      .as[(Double, Long)].collect().toSeq
    val want = df.orderBy($"value".desc, $"time".asc).limit(3)
      .select("value", "time").as[(Double, Long)].collect().toSeq
    assert(got == want)
  }

  test("limitPerSeries honors offset across partitions") {
    val got = SeriesOps.limitPerSeries(df, "time", Seq("tag"), n = 3,
        offset = 2, tieBreak = Seq("aux"))
      .select("tag", "time", "value", "aux")
      .orderBy("tag", "time").as[(String, Long, Double, String)]
      .collect().toSeq
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"tag").orderBy($"time".asc, $"aux".asc)
      df.withColumn("_rn", row_number().over(w))
        .filter($"_rn" > 2 && $"_rn" <= 5)
        .select("tag", "time", "value", "aux")
        .orderBy("tag", "time").as[(String, Long, Double, String)]
        .collect().toSeq
    }
    assert(got == want && got.nonEmpty)
  }

  test("generic struct path deep-copies buffered rows (SQL If over structs)") {
    // an If over two named_structs is NOT a CreateNamedStruct at the
    // aggregate's child, so update() takes the generic path; the buffered
    // rows hold strings whose backing buffers the scan recycles — a
    // shallow copy returns corrupted aux values
    graft.expressions.TopKRows.register(spark)
    val wide = (1 to 500).map(i =>
      (i.toDouble, s"left_payload_$i", s"right_payload_$i"))
      .toDF("v", "a", "b").repartition(7)
    wide.createOrReplaceTempView("topk_generic_in")
    val got = spark.sql(
      """SELECT explode(topk_rows(
        |  IF(v % 2 = 0, named_struct('v', v, 'aux', a),
        |               named_struct('v', v, 'aux', b)), 4, 1, 'D')) AS r
        |FROM topk_generic_in""".stripMargin)
      .select("r.v", "r.aux").as[(Double, String)].collect().toSeq.sortBy(_._1)
    val want = (1 to 500).map(i =>
      (i.toDouble, if (i % 2 == 0) s"left_payload_$i" else s"right_payload_$i"))
      .sortBy(-_._1).take(4).sortBy(_._1)
    assert(got == want)
  }

  test("null sort keys are NOT candidates (selector skip, like max_by)") {
    // round 14: a null PRIMARY key means the row has no value for the
    // selected field — it is not a point, so top/bottom skip it (the
    // reference's selectors iterate the field's existing values only;
    // same rule Spark's max_by applies to null keys)
    val withNulls = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 5.0), ("a", null, 7.0), ("a", 3L, 6.0), ("a", 4L, null),
      ("a", 5L, 8.0)).toDF("tag", "time", "value").repartition(3)
    val got = SeriesOps.topPerSeries(withNulls, "value", "time", Seq("tag"),
        2, bottom = true)
      .select("rank_in_series", "time")
      .orderBy("rank_in_series").as[(Int, Option[Long])].collect().toSeq
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"tag").orderBy($"value".asc, $"time".asc)
      withNulls.filter($"value".isNotNull)
        .withColumn("r", row_number().over(w)).filter($"r" <= 2)
        .select("r", "time").orderBy("r")
        .as[(Int, Option[Long])].collect().toSeq
    }
    assert(got == want)
  }

  test("map-side partials keep the shuffle bounded: no Window in the plan") {
    val plan = SeriesOps.topPerSeries(df, "value", "time", Seq("tag"), 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no WindowExec:\n$plan")
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
  }
}
