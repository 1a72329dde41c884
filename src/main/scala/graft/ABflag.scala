package graft

// SCRATCH dev tool: interleaved in-JVM A/B of a sys-prop-toggled code path
// over declared queries. Usage: runMain graft.ABflag <prop> <q1,q2,..> [reps]
// NOT part of the declared surface; delete before commit.
import org.apache.spark.sql.SparkSession

object ABflag {
  def main(args: Array[String]): Unit = {
    val prop = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 4
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
    names.foreach { name =>
      def run(v: Boolean): Double = {
        sys.props(prop) = v.toString
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        SparkEntry.releaseCheckpoints(df)
        s
      }
      run(false); run(true) // warm both variants
      (0 until reps).foreach { k =>
        val a = run(false)
        val b = run(true)
        println(f"[abflag] $name rep$k $prop=false $a%.3f s  true $b%.3f s")
      }
      sys.props.remove(prop)
    }
    spark.stop()
  }
}
