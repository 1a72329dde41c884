package graft

import graft.pipeline.AnomalyDetect

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
}
