package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time queries under conf overrides.
  * Usage: runMain graft.ConfTrial <q1,q2,...> [aqe=true|false] [parts=N]
  */
object ConfTrial {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val aqe = args.find(_.startsWith("aqe=")).map(_.drop(4)).getOrElse("true")
    val parts = args.find(_.startsWith("parts=")).map(_.drop(6)).getOrElse("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).count()
      val times = (0 until 3).map { k =>
        sc.setJobGroup(s"t-$name-$k", name)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        sc.clearJobGroup()
        s
      }
      val jobs = sc.statusTracker.getJobIdsForGroup(s"t-$name-0").length
      println(f"[conftrial] $name aqe=$aqe parts=$parts: median=${times.sorted.apply(1)}%.3f s jobs=$jobs")
    }
    spark.stop()
  }
}
