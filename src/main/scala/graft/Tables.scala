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
    * `events.ts` is ns-precision in parquet — openGemini's native time unit
    * (int64 ns, SURVEY §1.2) which Spark's TimestampType (µs) can't hold.
    * Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`; we keep
    * the exact ns epoch as `ts_ns` (LONG) and expose `ts` as the truncated
    * µs TIMESTAMP view — matching how openGemini stores int64 ns and
    * converts at the query edges.
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
      if (name == "events")
        df.withColumn("ts_ns", col("ts"))
          // integer div — ns epochs exceed double's 2^53 exact range
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
