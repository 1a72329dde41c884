package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall + task time for one query execution.
  * Usage: runMain graft.StageTime <q1,...> [sfDir]
  */
object StageTime {
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
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L))
        stages.add(f"  stage ${si.stageId} tasks=${si.numTasks} wall=${wall}ms " +
          f"exec=${si.taskMetrics.executorRunTime}ms " +
          f"deser=${si.taskMetrics.executorDeserializeTime}ms " +
          f"shW=${si.taskMetrics.shuffleWriteMetrics.writeTime / 1000000}ms " +
          f"shWb=${si.taskMetrics.shuffleWriteMetrics.bytesWritten} " +
          f"shRb=${si.taskMetrics.shuffleReadMetrics.totalBytesRead} " +
          f"${si.name.take(60)}")
      }
    })
    names.foreach { name =>
      // noop write, NOT count() — count() prunes cardinality-neutral
      // subtrees (round-12 lesson)
      def mat(): Unit = SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      mat() // warm
      Thread.sleep(300); stages.clear()
      val t0 = System.nanoTime()
      mat()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"[stagetime] $name: $s%.3f s")
      stages.forEach(println)
      stages.clear()
    }
    spark.stop()
  }
}
