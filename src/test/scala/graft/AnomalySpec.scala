package graft

import graft.pipeline.{AnomalyDetect, Castor, CastorWorker}

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("z-score flags the spike, not the steady series") {
    // steady series with one spike at t=30
    val vals = Seq.fill(30)(10.0) ++ Seq(100.0) ++ Seq.fill(10)(10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("tag", "t", "v")
    val out = AnomalyDetect.zscore(df, "v", "t", Seq("tag"),
        window = 10, k = 3.0)
      .select("_t", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(out(30L))                       // the spike
    assert(out.count(_._2) == 1)           // and only the spike
  }

  test("castor boundary with the z-score model reproduces q63 (9dp)") {
    // the pluggable-model boundary must be a drop-in for the window-
    // function detector: same rows, same flags, scores equal to 9
    // decimal places (the gate's own tolerance — the codegen path uses
    // Spark's moment-based window stddev, the castor model the two-pass
    // fold; they differ only in low-order FP bits) — over real data
    // with multiple series and NULLs (the q63 input shape)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("event_type", "_t", "value")
      .collect().toSeq.map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("_t"), r.getAs[Double]("value"),
        math.rint(r.getAs[Double]("zscore") * 1e9) / 1e9,
        r.getAs[Boolean]("is_anomaly")))
    val events = Tables.table(spark, sf, "events")
    val direct = canon(AnomalyDetect.zscore(events, "value", "ts",
      Seq("event_type"), window = 20, k = 3.0))
    val viaBoundary = canon(Castor.detect(events, "value", "ts",
      Seq("event_type"), Castor.zscoreModel(20, 3.0)))
    assert(viaBoundary == direct)
    assert(direct.nonEmpty)
  }

  test("castor python worker: over-the-wire verdicts equal in-JVM (q63 data)") {
    // the REAL subprocess hop: zscore computed by a python3 child over
    // the documented columnar batch contract must equal the in-JVM
    // model bit-for-bit (same op order on both sides)
    assume(new java.io.File("/usr/bin/python3").exists() ||
      sys.env.get("PATH").exists(_.split(':')
        .exists(p => new java.io.File(p, "python3").exists())))
    val events = Tables.table(spark, sf, "events")
    val inJvm = Castor.detect(events, "value", "ts",
        Seq("event_type"), Castor.zscoreModel(20, 3.0))
      .orderBy("event_type", "_t", "value").collect().toSeq
    val overWire = Castor.detect(events, "value", "ts",
        Seq("event_type"), CastorWorker.pyZscoreModel(20, 3.0))
      .orderBy("event_type", "_t", "value").collect().toSeq
    assert(!CastorWorker.unavailable(), "python3 worker failed to spawn")
    assert(overWire == inJvm)
    assert(inJvm.nonEmpty)
  }

  test("castor python worker: missing interpreter falls back in-JVM") {
    val df = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 50.0))
      .toDF("tag", "t", "v")
    val model = CastorWorker.pyThresholdModel(10.0,
      interpreter = "graft_no_such_interpreter")
    val out = Castor.detect(df, "v", "t", Seq("tag"), model)
      .select("_t", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> false, 1L -> false, 2L -> true))
    assert(CastorWorker.unavailable("graft_no_such_interpreter"))
  }

  test("castor models are swappable; contract violations fail loudly") {
    val df = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 50.0))
      .toDF("tag", "t", "v")
    val out = Castor.detect(df, "v", "t", Seq("tag"),
        Castor.thresholdModel(10.0))
      .select("_t", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> false, 1L -> false, 2L -> true))
    // a model returning the wrong verdict count is rejected
    val bad: Castor.Model = _ => Castor.Verdicts(Array(0.0), Array(false))
    val e = intercept[org.apache.spark.SparkException] {
      Castor.detect(df, "v", "t", Seq("tag"), bad).collect()
    }
    assert(e.getMessage != null)
  }
}
