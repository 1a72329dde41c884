package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Streaming / continuous processing — reference §2.9:
  *
  *  - CREATE STREAM (`influxql/ast.go:11469` CreateStreamStatement): a
  *    standing `SELECT agg… GROUP BY time(d), tags INTO target` over
  *    incoming writes, with `DELAY d` as the lateness allowance. The
  *    reference keeps a fixed ring of tumbling windows and drops points
  *    later than maxDelay (`app/ts-store/stream/time_task.go:98-206`) —
  *    which is exactly Structured Streaming watermark semantics: windows
  *    close (and emit, in append mode) once the watermark passes
  *    window.end + delay; later data is dropped.
  *  - Continuous queries (`services/continuousquery/service.go:178`):
  *    periodic re-execution with advancing time bounds ≈ a triggered
  *    streaming job (`Trigger.ProcessingTime` / `AvailableNow`).
  *  - Downsampling (`ast.go:11262`): tiered rollups ≈ the same windowed
  *    aggregation written to a rollup table on a schedule.
  *
  * Scale: the watermarked window agg is Spark's canonical stateful
  * streaming shape — state is partitioned by (tags, window), partial
  * aggregation happens before the shuffle, and expired state is dropped by
  * the watermark, so state size is bounded by (#series × windows-in-delay).
  */
object Streams {

  /** CREATE STREAM … DELAY d: tumbling-window standing aggregation.
    * `delay` is the lateness allowance (watermark), `interval` the
    * `GROUP BY time(d)` bucket. Returns the streaming DataFrame; attach a
    * sink via [[into]] (or any writeStream). */
  def createStream(source: DataFrame, time: String, delay: String,
                   interval: String, tags: Seq[String],
                   aggs: Seq[Column]): DataFrame = {
    val groups = window(col(time), interval) +: tags.map(col)
    source.withWatermark(time, delay)
      .groupBy(groups: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("wstart", col("window.start"))
      .withColumn("wend", col("window.end"))
      .drop("window")
  }

  /** SELECT … INTO target for a stream: append-mode parquet sink — rows are
    * emitted exactly once, when the watermark closes their window (the
    * reference's flush-on-window-close, `time_task.go:154`). */
  def into(streamed: DataFrame, targetPath: String,
           checkpoint: String): DataStreamWriter[Row] =
    streamed.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", targetPath)
      .option("checkpointLocation", checkpoint)

  /** Continuous query: re-execute the rollup over whatever new data arrived,
    * then stop (the reference's EVERY tick ≈ one AvailableNow run per
    * schedule; checkpointing makes each tick incremental). */
  def continuousQueryTick(streamed: DataFrame, targetPath: String,
                          checkpoint: String): Unit = {
    val q = into(streamed, targetPath, checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch downsample: one rollup pass of a time range into a target table —
    * the reference's downsample job (`engine_downsample.go`) re-expressed as
    * a deterministic batch write, partitioned by bucket date so retention
    * deletes and reads prune by partition. */
  def downsample(source: DataFrame, time: String, interval: String,
                 tags: Seq[String], aggs: Seq[Column],
                 targetPath: String): Unit = {
    val groups = window(col(time), interval) +: tags.map(col)
    source.groupBy(groups: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("wstart", col("window.start"))
      .withColumn("wdate", to_date(col("wstart")))
      .drop("window")
      .write.mode("append").partitionBy("wdate").parquet(targetPath)
  }

  /** Retention enforcement: drop rollup/raw partitions older than the
    * cutoff (reference: retention policy duration, `retentionpolicy.go:33`).
    * With date-partitioned layout this is partition pruning + delete, not
    * a scan. */
  def retentionCutoff(spark: SparkSession, path: String,
                      cutoffDate: String): DataFrame =
    spark.read.parquet(path).filter(col("wdate") >= lit(cutoffDate))

  /** Streaming exact dedup at ingest: keep the first row per content
    * hash, dropping duplicates that arrive within the watermark delay of
    * each other. The streaming counterpart of `pipeline.Dedup.exact` for
    * a training-data firehose — same design point: state and shuffle key
    * is the 8-byte `xxhash64` of the content columns, never the raw
    * text, and `dropDuplicatesWithinWatermark` evicts a hash's state
    * once the watermark passes it, so state stays bounded by (ingest
    * rate × delay) instead of growing with corpus size. Duplicates
    * separated by more than the delay are admitted again by design —
    * global history is the batch job's role (run `Dedup.exact` over the
    * landed table), the stream's role is cheap near-real-time
    * suppression of the bursty duplicates ingest actually produces. */
  def dedupStream(source: DataFrame, time: String, delay: String,
                  contentCols: Seq[String]): DataFrame =
    source
      .withColumn("_ck", xxhash64(contentCols.map(col): _*))
      .withWatermark(time, delay)
      .dropDuplicatesWithinWatermark("_ck")
      .drop("_ck")

  /** Streaming dedup against the LANDED corpus: drop arriving rows whose
    * content fingerprint already exists in a static history frame (the
    * fingerprints of everything previously admitted — e.g.
    * `landed.select(xxhash64(text).as("fp"))`, or the dedup key column a
    * curation pipeline persisted). Complements [[dedupStream]]: that op
    * suppresses bursty near-in-time duplicates with bounded state, this
    * one enforces the corpus-wide invariant via a stream-static LEFT
    * ANTI join — per micro-batch Catalyst broadcasts the batch side or
    * shuffles on the 8-byte fingerprint, never the text, and the
    * history frame can be arbitrarily large because it stays a lazy
    * batch scan (column-pruned to one LONG), re-planned each batch so
    * an appended history file is picked up without restart. */
  def dedupAgainstHistory(source: DataFrame, contentCols: Seq[String],
                          historyFingerprints: DataFrame,
                          fpCol: String = "fp"): DataFrame = {
    val hist = historyFingerprints.select(col(fpCol).as("_ck")).distinct()
    source
      .withColumn("_ck", xxhash64(contentCols.map(col): _*))
      .join(hist, Seq("_ck"), "left_anti")
      .drop("_ck")
  }

  /** Subscriptions (`influxql/ast.go:6049` CreateSubscriptionStatement;
    * dispatch at `coordinator/subscriber.go:230`): every write to a
    * measurement fans out to subscriber destinations. `ALL` is the
    * reference's AllWriter — each destination receives every batch;
    * `ANY` its RoundRobinWriter — batches rotate across destinations.
    *
    * Spark-native shape: a `foreachBatch` body. For ALL the micro-batch
    * is persisted ONCE and handed to each destination, so fan-out costs
    * N sink writes, not N recomputations of the source (at 100 TB/day
    * ingest the recompute, not the copy, is what would kill this).
    * Destinations are callbacks `(batch, batchId) => Unit` — a parquet
    * append, an HTTP forward via [[graft.sources.PromRemoteWrite]].encode,
    * a Kafka write — the transport is the caller's. */
  def subscriptionSink(destinations: Seq[(DataFrame, Long) => Unit],
                       mode: String = "ALL"): (DataFrame, Long) => Unit = {
    require(destinations.nonEmpty, "subscription needs a destination")
    val m = mode.toUpperCase
    require(m == "ALL" || m == "ANY", s"unknown subscription mode $mode")
    (batch: DataFrame, id: Long) =>
      if (m == "ANY")
        destinations(((id % destinations.size).toInt + destinations.size)
          % destinations.size)(batch, id)
      else {
        batch.persist()
        try destinations.foreach(_(batch, id))
        finally { batch.unpersist(); () }
      }
  }
}
