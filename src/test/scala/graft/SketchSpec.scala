package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.functions.Sketches.CountMinSketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("count-min: estimates dominate true counts, bounded error, mergeable") {
    val depth = 4; val width = 256
    // skewed key distribution: key k appears k times, k = 1..50
    val rows = (1 to 50).flatMap(k => Seq.fill(k)(s"key$k"))
    val df = rows.toDF("k").repartition(8) // force partial merges
    val sketch = df.agg(Sketches.cms(depth, width)($"k").as("s"))
      .as[Array[Long]].collect().head

    val n = rows.size
    (1 to 50).foreach { k =>
      val est = CountMinSketch.estimate(sketch, s"key$k", depth, width)
      assert(est >= k, s"CMS underestimated key$k")              // one-sided
      assert(est <= k + (2.0 * n / width).ceil.toLong + 1,       // ε·N bound
        s"key$k est $est too high")
    }
    // heavy hitter ranking survives sketching
    val top = (1 to 50).map(k =>
      k -> CountMinSketch.estimate(sketch, s"key$k", depth, width))
      .sortBy(-_._2).take(3).map(_._1).toSet
    assert(top.contains(50) && top.contains(49))
  }

  test("cmsTopN: in-aggregator candidates match exact top-n when the " +
      "candidate budget covers the key flow, and survive partial merges") {
    val rows = (1 to 50).flatMap(k => Seq.fill(k)(s"key$k"))
    val df = rows.toDF("k").repartition(8) // force partial merges
    val hits = df.agg(Sketches.cmsTopN(4, 256, maxCand = 64, n = 5)($"k")
        .as("hits"))
      .select(explode($"hits").as("h"))
      .select($"h.rnk", $"h.key", $"h.est")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(hits.map(_._2).toSeq ==
      Seq("key50", "key49", "key48", "key47", "key46"))
    // CMS estimates are one-sided: est >= true count
    hits.foreach { case (_, k, est) =>
      assert(est >= k.stripPrefix("key").toInt) }
  }

  test("cmsTopN: bounded candidate budget still surfaces the heavy hitters") {
    // 200 light keys (1x) + 3 heavy keys; budget far below distinct count
    val rows = (1 to 200).map(k => s"light$k") ++
      Seq.fill(500)("heavyA") ++ Seq.fill(300)("heavyB") ++
      Seq.fill(200)("heavyC")
    val df = rows.toDF("k").repartition(8)
    val hits = df.agg(Sketches.cmsTopN(4, 256, maxCand = 16, n = 3)($"k")
        .as("hits"))
      .select(explode($"hits").as("h")).select($"h.key")
      .as[String].collect().toSet
    assert(hits == Set("heavyA", "heavyB", "heavyC"))
  }
}
