package graft.tools
import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("DBG_DIR", "/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries(sys.env.getOrElse("DBG_QUERY", "q91_promql_at"))(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
