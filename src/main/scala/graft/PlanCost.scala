package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: split per-invocation cost into plan-build (analyze+optimize+
  * physical planning) vs execution. Usage: runMain graft.PlanCost <q1,...>
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
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
    spark.sparkContext.setLogLevel("WARN")
    // noop write, NOT count(): under count() Catalyst prunes
    // cardinality-neutral subtrees (round-12 lesson — Bench.scala doc)
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    names.foreach { name =>
      mat(SparkEntry.queries(name)(spark, sfDir)) // warm
      val m = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force full planning
        val t2 = System.nanoTime()
        mat(df)
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }.sortBy(t => t._1 + t._2 + t._3).apply(1)
      println(f"[plancost] $name: build=${m._1}%.3f plan=${m._2}%.3f exec=${m._3}%.3f total=${m._1 + m._2 + m._3}%.3f")
    }
    spark.stop()
  }
}
