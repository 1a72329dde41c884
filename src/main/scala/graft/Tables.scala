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
    * every query that names the table. Staleness is handled by a file
    * fingerprint (name+mtime+size per file) checked on every lookup — a
    * regenerated file at the same path misses the memo instead of serving
    * a stale schema or stale resident batches.
    *
    * Resident hot tier: the reference serves repeated reads of hot data
    * from a DECODED block cache, not from disk (`lib/readcache/
    * blockcache.go` + `readcacheInstance.go` — LRU'd decoded meta/data
    * blocks sized as a fraction of process memory; `engine/immutable`
    * consults it on every chunk read). The Spark-first analogue is an
    * in-memory columnar `persist` of the small catalog tables: first
    * access decodes parquet once and populates compressed columnar
    * batches; every later query over the table scans memory. The tier is
    * size-gated twice — [[hotTierDirMaxBytes]] over the whole sf
    * directory (tighter than the small-query profile's gate, so the
    * ×10/×100 scale harness dirs always measure the pushed-down parquet
    * scan path) and `graft.storage.hotTierMaxBytes` per table (0 = off):
    * at any real deployment the gate disengages — at 100 TB residency
    * belongs to recent-shard caches, not whole tables. Eviction under
    * memory pressure is Spark's own (MEMORY_ONLY recomputes from the
    * file). */
  private final case class Entry(df: DataFrame, fingerprint: String,
                                 resident: Boolean)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Entry]()

  val hotTierConfKey = "graft.storage.hotTierMaxBytes"
  val hotTierDefaultMaxBytes: Long = 256L << 20
  /** Residency only for genuinely small catalogs (dimension-table class);
    * the scale dirs stay on the scan path regardless of per-table size. */
  val hotTierDirMaxBytes: Long = 64L << 20

  /** Staleness fingerprint of a parquet file or directory (name+mtime+
    * size per file) — the key the hot tier and the model cache share. */
  def fingerprint(path: String): String = listing(path)._1

  /** (fingerprint, totalBytes) of a parquet file or directory-of-files. */
  private def listing(path: String): (String, Long) = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    if (!Files.exists(p)) ("missing", 0L)
    else {
      val files: Seq[java.nio.file.Path] =
        if (Files.isDirectory(p)) {
          val s = Files.walk(p)
          try {
            val it = s.filter(Files.isRegularFile(_)).iterator()
            val b = Seq.newBuilder[java.nio.file.Path]
            while (it.hasNext) b += it.next()
            b.result()
          } finally s.close()
        } else Seq(p)
      var bytes = 0L
      val sb = new StringBuilder
      files.map(_.toString).sorted.foreach { f =>
        val fp = Paths.get(f)
        val (m, sz) =
          try {
            val a = Files.readAttributes(
              fp, classOf[java.nio.file.attribute.BasicFileAttributes])
            (a.lastModifiedTime.toMillis, a.size)
          } catch { case _: Exception => (0L, 0L) }
        bytes += sz
        sb.append(f).append(':').append(m).append(':').append(sz).append('|')
      }
      (sb.result(), bytes)
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val (fp, bytes) = listing(path)
    val key = (spark, path)
    val cur = memo.get(key)
    if (cur != null && cur.fingerprint == fp) cur.df
    else memo.synchronized {
      val cur2 = memo.get(key)
      if (cur2 != null && cur2.fingerprint == fp) cur2.df
      else {
        // stale entry: drop its cached batches globally so no session's
        // CacheManager substitution can serve the old data
        if (cur2 != null && cur2.resident) cur2.df.unpersist(blocking = false)
        val raw = spark.read.parquet(path)
        val df0 = if (name == "events") normalizeEventsTime(raw) else raw
        val maxBytes = spark.conf
          .get(hotTierConfKey, hotTierDefaultMaxBytes.toString).toLong
        val resident = bytes > 0 && bytes <= maxBytes &&
          ExecProfile.dirBytes(sfDir) <= hotTierDirMaxBytes
        val df =
          if (resident) {
            // Spread the decoded cache across cores: a 1-11 MB parquet
            // file is a single scan split (row-group granularity), so an
            // un-repartitioned persist would serialize every downstream
            // map-side stage into one task — q19's orders aggregation
            // measured 187 ms in a single task vs ~20 ms spread. One
            // round-robin shuffle at cache-fill time, amortized over
            // every later query; ~64 KB compressed (~0.3 MB decoded)
            // per cached partition, capped at 8 (measured: a 32-way
            // spread taxed every small scan stage ~70 ms of per-task
            // deserialization — BASELINE.md round 12).
            val parts = math.max(1, math.min(8,
              ((bytes + (64L << 10) - 1) / (64L << 10)).toInt))
            val spread = if (parts > 1) df0.repartition(parts) else df0
            spread.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          } else df0
        memo.put(key, Entry(df, fp, resident))
        df
      }
    }
  }

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
