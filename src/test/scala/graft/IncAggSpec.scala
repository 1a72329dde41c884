package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IncAgg

/** Incremental aggregation (`inc_agg_transform.go` semantics): each run
  * merges only new data into persisted partial state; the finalized view
  * must equal a from-scratch aggregation of everything ingested. */
class IncAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def freshDirs(): (String, String) = (
    Files.createTempDirectory("graft_inc_src").toString,
    Files.createTempDirectory("graft_inc").toString + "/state")

  private def append(src: String, rows: Seq[(Timestamp, String, Double)]): Unit =
    rows.toDF("time", "tag", "value")
      .write.mode("append").parquet(src)

  private def source(src: String): DataFrame = spark.read.parquet(src)

  private def norm(df: DataFrame): Seq[(String, Timestamp, Long, Double, Double, Double)] =
    df.select($"tag", $"wstart", $"cnt", $"sum", $"mean", $"mx")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSeq.sortBy(t => (t._1, t._2.getTime))

  test("increment over appended tail equals full recompute") {
    val (src, state) = freshDirs()
    append(src, Seq((ts(0), "a", 1.0), (ts(1), "a", 3.0), (ts(2), "b", 5.0)))
    val first = IncAgg.run(source(src), "time", "5 minutes", Seq("tag"),
      "value", state)
    assert(norm(first).map(_._3).sum == 3)

    // second batch: grows the open bucket and opens two new ones
    append(src, Seq((ts(4), "a", 7.0), (ts(6), "a", 9.0), (ts(11), "b", 2.0)))
    val inc = IncAgg.run(source(src), "time", "5 minutes", Seq("tag"),
      "value", state)

    val fullState = Files.createTempDirectory("graft_incf").toString + "/s"
    val full = IncAgg.fullRecompute(source(src), "time", "5 minutes",
      Seq("tag"), "value", fullState)
    assert(norm(inc) == norm(full))
    // stddev finalization matches the sample stddev of {1,3,7}
    val sd = inc.filter($"tag" === "a" && $"cnt" === 3).select($"stddev")
      .as[Double].collect().head
    assert(math.abs(sd - math.sqrt(28.0 / 3)) < 1e-9)
    // first/last selectors: earliest and latest value of the bucket,
    // stable across the incremental tail-replace
    val fl = inc.filter($"tag" === "a" && $"cnt" === 3)
      .select($"fst", $"lst").as[(Double, Double)].collect().head
    assert(fl == ((1.0, 7.0)))
  }

  test("late data inside the lateness horizon is re-bucketed; older is dropped") {
    val (src, state) = freshDirs()
    append(src, Seq((ts(0), "a", 1.0), (ts(10), "a", 2.0)))
    IncAgg.run(source(src), "time", "5 minutes", Seq("tag"), "value",
      state, lateness = "5 minutes")
    // one bucket late (within horizon) + very old (outside horizon)
    append(src, Seq((ts(7), "a", 100.0), (ts(1), "a", 999.0)))
    val inc = IncAgg.run(source(src), "time", "5 minutes", Seq("tag"),
      "value", state, lateness = "5 minutes")
    val byBucket = norm(inc).map(t => t._2.getTime / 60000 -> t._4).toMap
    assert(byBucket(5L) == 100.0) // ts(7) accepted into [5,10)
    assert(byBucket(0L) == 1.0) // ts(1) too old: bucket [0,5) untouched
    // the fallback picks the stragglers up
    val fullState = Files.createTempDirectory("graft_incf2").toString + "/s"
    val full = IncAgg.fullRecompute(source(src), "time", "5 minutes",
      Seq("tag"), "value", fullState)
    assert(norm(full).map(t => t._2.getTime / 60000 -> t._4).toMap
      .apply(0L) == 1000.0)
  }

  test("tail filter is pushed down to the parquet scan") {
    val (src, _) = freshDirs()
    append(src, Seq((ts(0), "a", 1.0)))
    val plan = source(src).filter($"time" >= lit(ts(100)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(time"))
  }

  test("repeated run with no new data is a no-op on the view") {
    val (src, state) = freshDirs()
    append(src, Seq((ts(0), "a", 1.0), (ts(6), "b", 2.0)))
    val r1 = norm(IncAgg.run(source(src), "time", "5 minutes", Seq("tag"),
      "value", state))
    val r2 = norm(IncAgg.run(source(src), "time", "5 minutes", Seq("tag"),
      "value", state))
    assert(r1 == r2)
  }
}
