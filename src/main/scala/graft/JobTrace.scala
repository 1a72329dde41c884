package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run SparkEntry queries and print each scheduled job's
  * call site + wall time. Usage: runMain graft.JobTrace <q1,q2,...> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.add(s"  job ${j.jobId}: stages=[${j.stageInfos.map(si => si.name + ":" + si.numTasks).mkString("; ")}]")
    })
    names.foreach { name =>
      // noop write, NOT count() — count() prunes cardinality-neutral
      // subtrees AND changes the job structure (round-12 lesson); the
      // traced jobs must be the ones Bench's noop materialization runs
      def mat(): Unit = SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      mat() // warm-up run (jobs recorded but discarded below)
      Thread.sleep(200)
      jobs.clear()
      val t0 = System.nanoTime()
      mat()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobtrace] $name: $s%.3f s, ${jobs.size} jobs")
      jobs.forEach(println)
      jobs.clear()
    }
    spark.stop()
  }
}
