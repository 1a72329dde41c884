package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StreamDDL, Streams}

/** CREATE STREAM semantics (reference window lifecycle
  * `app/ts-store/stream/time_task.go:98-206`): tumbling windows keyed by
  * tags, DELAY=watermark, flush-on-close, late-drop. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("stream window agg: closed windows emit, late data within delay counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val src = mem.toDF().toDF("time", "tag", "value")

    val agg = Streams.createStream(src, "time", delay = "5 seconds",
      interval = "10 seconds", tags = Seq("tag"),
      aggs = Seq(count(lit(1)).as("n"), sum($"value").as("total")))

    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("stream_out").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      // window [0,10): two points; then advance watermark past 10+5
      mem.addData((ts(1), "a", 1.0), (ts(3), "a", 2.0))
      q.processAllAvailable()
      mem.addData((ts(9), "a", 4.0))   // still inside [0,10), wm not passed
      q.processAllAvailable()
      mem.addData((ts(16), "a", 8.0))  // wm -> 11 > 10: closes [0,10)
      q.processAllAvailable()
      val closed = spark.table("stream_out")
        .select($"tag", $"n", $"total", $"wstart".cast("long").as("ws"))
        .as[(String, Long, Double, Long)].collect().toSet
      assert(closed == Set(("a", 3L, 7.0, 0L))) // all three pts, incl. 9s
      // late arrival for [0,10) past the delay → dropped
      mem.addData((ts(2), "a", 100.0), (ts(31), "a", 16.0))
      q.processAllAvailable()
      val after = spark.table("stream_out")
        .select($"total").as[Double].collect().toSet
      assert(after.contains(7.0) && !after.contains(107.0))
      // the 16s window closed when wm passed 20+5 (31-5=26)
      assert(after.contains(8.0))
    } finally q.stop()
  }

  test("streaming replay of the events table matches the batch aggregation") {
    // FIXTURES.md: events is the stream stand-in — file-source replay must
    // produce exactly the batch windowed aggregation once all data is in.
    val ev = Tables.table(spark, sf, "events")
    val batch = ev.groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"event_type", $"window.start".as("ws"), $"n")
    val stream = Tables.normalizeEventsTime(spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf))
    val agg = Streams.createStream(stream, "ts", delay = "1 minute",
      interval = "6 hours", tags = Seq("event_type"),
      aggs = Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("replay_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay_out")
        .select($"event_type", $"wstart".as("ws"), $"n")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("CREATE STREAM DDL parses and builds the standing aggregation") {
    import graft.streaming.StreamDDL
    val stmt = StreamDDL.parse(
      "CREATE STREAM s1 INTO dst SELECT sum(f1), count(f1) FROM mst0 " +
      "GROUP BY time(5s), tk1 DELAY 2s")
    assert(stmt.name == "s1" && stmt.target == "dst")
    assert(stmt.calls == Seq(("sum", "f1"), ("count", "f1")))
    assert(stmt.intervalNs == 5000000000L && stmt.delayNs == 2000000000L)
    assert(stmt.tags == Seq("tk1"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamDDL.build(stmt, mem.toDF().toDF("time", "tk1", "f1"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("ddl_out").start()
    try {
      mem.addData((new Timestamp(1000), "a", 1.0),
        (new Timestamp(3000), "a", 2.0), (new Timestamp(9000), "a", 4.0))
      q.processAllAvailable()
      mem.addData((new Timestamp(20000), "a", 8.0)) // closes [0,5s)
      q.processAllAvailable()
      val closed = spark.table("ddl_out")
        .select($"tk1", $"sum", $"count").as[(String, Double, Long)]
        .collect().toSet
      assert(closed.contains(("a", 3.0, 2L)))
    } finally q.stop()

    val cq = StreamDDL.parse(
      "CREATE CONTINUOUS QUERY cq1 RESAMPLE EVERY 1m BEGIN INTO dst2 " +
      "SELECT mean(value) FROM cpu GROUP BY time(10s) END")
    assert(cq.name == "cq1" && cq.every.contains(60000000000L))
  }

  test("continuous query ticks are incremental via checkpoint") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft_cq_src").toString
    val dst = Files.createTempDirectory("graft_cq_dst").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_cq_ck").toString
    def writeBatch(offset: Int): Unit =
      (0 until 4).map(i => (new Timestamp((offset + i) * 60000L), "a",
        (offset + i).toDouble))
        .toDF("time", "tag", "value")
        .write.mode("append").parquet(src)
    def tick(): Unit = {
      val stream = spark.readStream
        .schema("time TIMESTAMP, tag STRING, value DOUBLE").parquet(src)
      val agg = Streams.createStream(stream, "time", "0 seconds",
        "2 minutes", Seq("tag"), Seq(count(lit(1)).as("n")))
      Streams.continuousQueryTick(agg, dst, ckpt)
    }
    writeBatch(0); tick()
    val after1 = spark.read.parquet(dst).count()
    writeBatch(10); tick()
    val after2 = spark.read.parquet(dst).count()
    assert(after1 > 0 && after2 > after1) // second tick appended new windows
    // windows are unique: each emitted exactly once across ticks
    val dups = spark.read.parquet(dst).groupBy("tag", "wstart").count()
      .filter($"count" > 1).count()
    assert(dups == 0)
  }

  test("downsample writes date-partitioned rollups; retention prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ds").toString
    val ev = Tables.table(spark, sf, "events")
    Streams.downsample(ev, "ts", "6 hours", Seq("event_type"),
      Seq(count(lit(1)).as("n"), sum($"value").as("total")), dir)
    val rolled = spark.read.parquet(dir)
    assert(rolled.columns.toSet ==
      Set("n", "total", "event_type", "wstart", "wdate"))
    val total = rolled.agg(sum($"n")).as[Long].collect().head
    assert(total == ev.count())
    val kept = Streams.retentionCutoff(spark, dir, "2024-01-15")
    assert(kept.count() < rolled.count() && kept.count() > 0)
  }

  test("streaming dedup suppresses duplicate content within the delay") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val src = mem.toDF().toDF("time", "text")
    val q = Streams.dedupStream(src, "time", "10 seconds", Seq("text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      // same doc three times inside the delay → one survivor
      mem.addData((ts(1), "doc-a"), (ts(2), "doc-a"), (ts(3), "doc-b"))
      q.processAllAvailable()
      mem.addData((ts(4), "doc-a"))
      q.processAllAvailable()
      val out = spark.table("dedup_out")
        .select($"text").as[String].collect().toSeq
      assert(out.sorted == Seq("doc-a", "doc-b"))
      // a duplicate far past the watermark is admitted again (state for
      // the hash was evicted — global dedup is the batch job's role)
      mem.addData((ts(60), "doc-a"))
      q.processAllAvailable()
      mem.addData((ts(61), "doc-a"))
      q.processAllAvailable()
      val after = spark.table("dedup_out")
        .filter($"text" === "doc-a").count()
      assert(after == 2L)
    } finally q.stop()
  }

  test("subscription ALL fans every batch out to every destination") {
    implicit val sqlCtx = spark.sqlContext
    val got = Seq.fill(2)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, String)])
    val dests: Seq[(org.apache.spark.sql.DataFrame, Long) => Unit] =
      got.map(buf => (b: org.apache.spark.sql.DataFrame, id: Long) =>
        buf.synchronized {
          buf ++= b.select($"text").as[String].collect().map((id, _))
        })
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("text").writeStream
      .foreachBatch(Streams.subscriptionSink(dests, "ALL"))
      .start()
    try {
      mem.addData("w1", "w2"); q.processAllAvailable()
      mem.addData("w3"); q.processAllAvailable()
      got.foreach { buf =>
        assert(buf.map(_._2).sorted == Seq("w1", "w2", "w3"))
      }
    } finally q.stop()
  }

  test("subscription ANY round-robins batches across destinations") {
    implicit val sqlCtx = spark.sqlContext
    val got = Seq.fill(2)(
      scala.collection.mutable.ArrayBuffer.empty[String])
    val dests: Seq[(org.apache.spark.sql.DataFrame, Long) => Unit] =
      got.map(buf => (b: org.apache.spark.sql.DataFrame, id: Long) =>
        buf.synchronized {
          buf ++= b.select($"text").as[String].collect()
        })
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("text").writeStream
      .foreachBatch(Streams.subscriptionSink(dests, "ANY"))
      .start()
    try {
      mem.addData("b0"); q.processAllAvailable() // batch 0 → dest 0
      mem.addData("b1"); q.processAllAvailable() // batch 1 → dest 1
      mem.addData("b2"); q.processAllAvailable() // batch 2 → dest 0
      assert(got(0).sorted == Seq("b0", "b2") && got(1).toSeq == Seq("b1"))
    } finally q.stop()
  }

  test("CREATE SUBSCRIPTION DDL parses name, db.rp, mode, destinations") {
    val s = StreamDDL.parseSubscription(
      """CREATE SUBSCRIPTION "sub0" ON "mydb"."autogen" DESTINATIONS """ +
        "ALL 'http://h1:9092', 'http://h2:9092'")
    assert(s == StreamDDL.Subscription("sub0", "mydb", "autogen", "ALL",
      Seq("http://h1:9092", "http://h2:9092")))
    intercept[IllegalArgumentException] {
      StreamDDL.parseSubscription(
        "CREATE SUBSCRIPTION s ON db.rp DESTINATIONS SOME 'x'")
    }
  }

  test("text-pipeline operators run unchanged inside a stream") {
    // every TextAnalysis op is a stateless column expression, so the same
    // code curates a stream micro-batch-by-micro-batch — the ingest-time
    // filter tier in front of the batch dedup/clustering jobs
    import graft.pipeline.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val feats = TextAnalysis.qualityFeatures(col("text"))
    val curated = mem.toDF().toDF("doc_id", "text")
      .withColumn("keep",
        TextAnalysis.qualityKeep(feats, minTokens = 5, minStopRatio = 0.0))
      .filter(col("keep"))
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.redactPii(col("text")).as("clean"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curated_out").start()
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "too short"),                                    // quality-dropped
        (3L, "contact me at a@b.com for the offer and the details"),
        (4L, "el perro corre para la casa y los gatos miran"))
      q.processAllAvailable()
      val out = spark.table("curated_out")
        .select($"doc_id", $"lang", $"clean")
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(out.map(_._1).toSeq == Seq(1L, 3L, 4L))
      assert(out(0)._2 == "en" && out(2)._2 == "es")
      assert(out(1)._3.contains("[EMAIL]") && !out(1)._3.contains("a@b.com"))
      // fingerprints agree with the batch expression on the same text
      val batchFp = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
        .toDF("doc_id", "text")
        .select(TextAnalysis.fingerprint($"text")).as[Long].head()
      val streamFp = spark.table("curated_out")
        .filter($"doc_id" === 1L).select($"fp").as[Long].head()
      assert(streamFp == batchFp)
    } finally q.stop()
  }

  test("dedupAgainstHistory drops rows already in the landed corpus") {
    implicit val sqlCtx = spark.sqlContext
    val landed = Seq("seen before", "also landed")
      .toDF("text").select(xxhash64($"text").as("fp"))
    val mem = MemoryStream[(Long, String)]
    val out = Streams.dedupAgainstHistory(
      mem.toDF().toDF("doc_id", "text"), Seq("text"), landed)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hist_dedup_out").start()
    try {
      mem.addData((1L, "seen before"), (2L, "brand new"),
        (3L, "also landed"), (4L, "another fresh one"))
      q.processAllAvailable()
      assert(spark.table("hist_dedup_out").select($"doc_id")
        .as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    } finally q.stop()
  }

  test("streaming sessionization: session_window merges events within " +
      "the gap, splits across it, and closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val src = mem.toDF().toDF("ts", "user_id", "value")
    // the streaming twin of batch q129: Spark-native session_window
    // with the same 30 min inactivity gap; watermark closes sessions
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("value_sum"))
      .select($"user_id",
        unix_millis($"session_window.start").as("start_ms"),
        unix_millis($"session_window.end").as("end_ms"),
        $"n_events", $"value_sum")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      def ts(min: Long) = new Timestamp(min * 60000)
      // u1: events at 0 and 20 min (gap 20 < 30 → one session);
      // next at 60 min (gap 40 > 30 → new session)
      mem.addData((ts(0), 1L, 1.0), (ts(20), 1L, 2.0))
      q.processAllAvailable()
      mem.addData((ts(60), 1L, 4.0))
      q.processAllAvailable()
      // advance the watermark far enough to close everything
      mem.addData((ts(200), 2L, 8.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"user_id", $"start_ms", $"n_events", $"value_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows.contains((1L, 0L, 2L, 3.0)), rows.toString)
      assert(rows.contains((1L, 3600000L, 1L, 4.0)), rows.toString)
      // session end = last event + gap (merged session spans to 50 min)
      val ends = spark.table("sess_out")
        .filter($"user_id" === 1L && $"start_ms" === 0L)
        .select($"end_ms").as[Long].collect()
      assert(ends.toSeq == Seq(50L * 60000), ends.toSeq.toString)
    } finally q.stop()
  }
}
