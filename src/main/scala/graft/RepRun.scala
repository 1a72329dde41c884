package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: rerun one query N times in one JVM and print each run's wall
  * time, isolating inter-rep effects (checkpoint release, forced GC).
  * Usage: runMain graft.RepRun <query> [reps] [release|norelease] [gc|nogc]
  */
object RepRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val release = !args.contains("norelease")
    val gc = !args.contains("nogc")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcMs(): Long = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(b.getCollectionTime, 0L))
      t
    }
    (0 until reps).foreach { k =>
      val g0 = gcMs()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      val gms = gcMs() - g0
      println(f"[reprun] $name rep$k: $s%.3f s gc=${gms}ms " +
        f"release=$release gc_between=$gc")
      if (release) SparkEntry.releaseCheckpoints(df)
      if (gc) System.gc()
    }
    spark.stop()
  }
}
