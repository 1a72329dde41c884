package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Size-gated execution profile, applied per query invocation.
  *
  * Spark's adaptive query execution materializes every exchange as its own
  * job (stage-by-stage re-optimization) — the right trade on a 100 TB scan,
  * where runtime stats drive coalescing, skew splitting, and join re-plans,
  * but pure scheduling overhead on a small scan: a 5-exchange plan over a
  * few MB pays 5 serialized job floors (~80 ms each on local[32]) to move
  * kilobytes. Real engines special-case small inputs the same way (e.g. a
  * single-stage "small query" path); the reference executes every query as
  * one pipeline regardless of size, so its per-query floor is flat.
  *
  * Policy: if the query's source directory holds less than
  * [[smallInputBytes]] of parquet, run the query without AQE and with a
  * small fixed shuffle fan-out (the whole DAG becomes ONE scheduled job);
  * otherwise restore the session's scale profile (AQE on, fan-out =
  * default parallelism). The gate is input-driven, so the ×10/×100 scale
  * harness dirs and any real deployment keep AQE — only genuinely tiny
  * inputs take the fast path.
  */
object ExecProfile {

  /** Inputs below this take the single-job small-query path. The ×10
    * replica dir (~1.5 GB of parquet) must stay on the AQE path — its
    * shuffles are large enough that runtime coalescing pays for the
    * stage barriers. */
  val smallInputBytes: Long = 1L << 30

  /** Shuffle fan-out for the small path: enough to keep 32 cores busy on
    * a skewed few-MB shuffle, few enough that per-task overhead stays
    * under the job floor. */
  val smallShufflePartitions = 8

  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total bytes of regular files under `dir`, memoized per path (the
    * bench/verify data dirs are immutable within a run; tests that
    * regenerate a dir use fresh temp paths). */
  def dirBytes(dir: String): Long =
    sizeCache.computeIfAbsent(dir, d => {
      val p = java.nio.file.Paths.get(d)
      if (!java.nio.file.Files.isDirectory(p)) 0L
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    })

  /** Apply the input-size profile for a query over `dir`. Runtime confs
    * only — the session's builder-time settings are untouched.
    *
    * Round-17 note: a "compute-heavy" variant that fanned the text-
    * pipeline queries out to defaultParallelism shuffle partitions under
    * the small profile was tried and MEASURED WORSE (interleaved A/B at
    * sf0.1: q123 warm reps 12-30 s at 32 partitions vs 2.7-5.2 s at 8;
    * q93 likewise ~2×) — on a steal-prone virtualized host, 4× more
    * short tasks multiply scheduling jitter where 8 longer tasks ride it
    * out; the per-stage exec/wall ratios that motivated the idea were
    * GC-inflated task times, not idle-core headroom. The 8-partition
    * small fan-out stands. */
  def tune(spark: SparkSession, dir: String): Unit = {
    val small = dirBytes(dir) < smallInputBytes
    spark.conf.set("spark.sql.adaptive.enabled", (!small).toString)
    spark.conf.set("spark.sql.shuffle.partitions",
      if (small) smallShufflePartitions.toString
      else spark.sparkContext.defaultParallelism.toString)
    // On the small path a planner-chosen broadcast join costs MORE than a
    // shuffle: the broadcast build is its own scheduled job, serialized
    // before the main job (one more job floor), while an 8-partition
    // shuffle of a few MB is just one extra stage inside the same job.
    // Explicit broadcast() hints in operators still win over this
    // threshold, so deliberately-broadcast dimensions keep their shape.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      if (small) "-1" else "10485760")
    spark.conf.set("spark.sql.join.preferSortMergeJoin",
      if (small) "false" else "true")
    // A single small parquet file scans as ONE task under the default
    // 128 MB split size — a serial scan stage on a 32-core machine. Split
    // small inputs finer so scan stages parallelize; at scale the default
    // keeps task counts sane.
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      if (small) "4m" else "128m")
    // …and 4 MB splits still under-provision CPU-heavy text work: a
    // compressed text column decodes ~10× its file bytes and tokenizes at
    // ~MB/s/core, so an 8 MB documents file became a 2-task scan doing
    // 15 s of single-threaded folds while 30 cores idled (the honest ×10
    // sweep's "superlinear" q107/q124 were exactly this). The open-cost
    // floor is what pins maxSplitBytes at 4 MB; dropping it lets
    // bytes-per-core drive the split so scans land near one task per
    // core regardless of compression ratio. Scale path keeps defaults —
    // at real input sizes bytes-per-core ≥ 4 MB anyway.
    spark.conf.set("spark.sql.files.openCostInBytes",
      if (small) "262144" else "4194304")
    spark.conf.set("spark.sql.files.minPartitionNum",
      spark.sparkContext.defaultParallelism.toString)
  }

  /** Is the session currently tuned to the small-input profile? Reads
    * the same runtime conf [[tune]] sets (AQE off ⇔ small path), so the
    * answer always matches the profile the current query runs under. */
  def isSmall(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.adaptive.enabled") == "false"

  /** Profile-following total order for a DATA-GROWING result (per-point /
    * per-doc outputs, high-cardinality tag lists): under the small-input
    * profile — where the input-size gate itself bounds the result and a
    * range sort's partition-bounds sampling job (a separate job that
    * re-executes the whole final stage) is pure scheduling floor — sort
    * in one task; at scale keep the scalable range-partitioned `orderBy`
    * (the q48 rule: a single-task sort of a data-growing result dominates
    * the query at ×100). Identical rows and total order on both paths. */
  def boundedSort(df: DataFrame,
                  cols: org.apache.spark.sql.Column*): DataFrame =
    if (isSmall(df.sparkSession))
      df.repartition(1).sortWithinPartitions(cols: _*)
    else df.orderBy(cols: _*)

  /** Collect a LIMIT-bounded resident-tier probe in ONE scheduled job.
    * `Dataset.limit(n).collect()` runs executeTake, whose incremental
    * partition scan (1 → 4 → 16 …) schedules a separate job per
    * iteration — right for a genuine early-stop LIMIT over a huge scan,
    * pure job floor for a probe whose plan stats already passed a byte
    * gate and is expected to return (nearly) all of its rows (q104's
    * two resident collects paid 3 jobs each this way). Scopes
    * `spark.sql.limit.initialNumPartitions` to the call so every
    * partition scans in the first take iteration; the conf is restored
    * after, keeping genuine limits conservative. */
  def takeAll[T](ds: org.apache.spark.sql.Dataset[T], n: Int): Array[T] = {
    val c = ds.sparkSession.conf
    val key = "spark.sql.limit.initialNumPartitions"
    val old = c.getOption(key)
    c.set(key, Int.MaxValue.toString)
    try ds.limit(n).collect()
    finally old match {
      case Some(v) => c.set(key, v)
      case None => c.unset(key)
    }
  }

  /** Broadcast `df` under the session's broadcast policy: the hint at
    * scale, a plain (shuffle) join under the small-query profile where a
    * broadcast build would be its own scheduled job. Use for operator-
    * internal tiny frames whose join strategy should follow the profile;
    * deliberately-broadcast DIMENSIONS keep an unconditional hint. */
  def maybeBroadcast(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1")
      df
    else broadcast(df)
}
