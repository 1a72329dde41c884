package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-provided parquet tables (see TESTDATA.md).
  *
  * In the reference engine a "measurement" maps a name to storage plus
  * tag/field metadata (`lib/util/lifted/influx/meta/measurement.go:238`).
  * Here a measurement is simply a parquet-backed DataFrame; tag columns
  * are the low-cardinality strings, fields the typed value columns, and
  * the time column is a native TIMESTAMP. Catalyst predicate/partition
  * pruning replaces the reference's inverted tag index.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from an sf directory. Scans stay column-pruned and
    * filter-pushed because we never materialize — callers compose lazily.
    *
    * `events.ts` arrives in whatever precision the producer wrote —
    * openGemini accepts every epoch precision at its edges (`httpd/
    * handler.go:276` epoch param; the line-protocol parser's precision
    * arg) and normalizes to int64 ns internally (SURVEY §1.2). We do the
    * same, adaptively per the parquet schema actually on disk:
    *   - INT64 `ts` (ns epoch; also how timestamp[ns] parquet reads under
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, since TimestampType
    *     is µs and can't hold ns): keep the exact ns epoch as `ts_ns`
    *     (LONG) and expose `ts` as the truncated µs TIMESTAMP view.
    *   - timestamp[us] parquet (TimestampType, or TIMESTAMP_NTZ when
    *     `isAdjustedToUTC=false` — sessions run with
    *     spark.sql.session.timeZone=UTC so the NTZ→TZ cast is the
    *     identity on instants): use it as `ts` directly and derive
    *     `ts_ns = unix_micros(ts) * 1000`.
    * Either way downstream sees the same two-column contract:
    * `ts` TIMESTAMP (µs) + `ts_ns` LONG (ns epoch).
    *
    * The resolved (analyzed, unexecuted) frame is memoized per
    * (session, path): a measurement's schema is catalog metadata in the
    * reference (`meta/measurement.go`), resolved once at registration —
    * not re-derived by re-listing files and re-reading parquet footers on
    * every query that names the table. Execution stays fully lazy; only
    * the driver-side listing + schema inference is shared. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, s"$sfDir/$name.parquet"), _ => {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") normalizeEventsTime(df) else df
    })

  /** Normalize an events frame (batch OR streaming — only the analyzed
    * schema is consulted) to the engine's time contract:
    * `ts` TIMESTAMP (µs) + `ts_ns` LONG (ns epoch). See the scan doc
    * above for the per-source-type rules. */
  def normalizeEventsTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          // integer div — ns epochs exceed double's 2^53 exact range
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType =>
        df.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        val utc = col("ts").cast(TimestampType) // identity under UTC session tz
        df.withColumn("ts", utc)
          .withColumn("ts_ns", unix_micros(utc) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected INT64 ns or timestamp)")
    }
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
