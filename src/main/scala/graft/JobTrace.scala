package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Dev tool: run one SparkEntry query and print each scheduled job's
  * call site. Usage: runMain graft.JobTrace <queryName> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up run (outside the traced window)
    SparkEntry.queries(name)(spark, sfDir).count()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.add(s"job ${j.jobId}: stages=[${j.stageInfos.map(si => si.name + ":" + si.numTasks).mkString("; ")}]")
    })
    SparkEntry.queries(name)(spark, sfDir).count()
    Thread.sleep(500)
    jobs.forEach(s => println(s"[jobtrace] $s"))
    spark.stop()
  }
}
