package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate per-stage throughput suspects on sf0.1. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name: ${ts.sorted.apply(1)}%.3f s")
    }
    time("scan count")(orders.count())
    time("scan sum double")(
      orders.groupBy("o_custkey").agg(sum("o_totalprice")).count())
    time("scan sum decimal")(
      orders.groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,4)"))).count())
    time("scan sum long-scaled")(
      orders.groupBy("o_custkey")
        .agg(sum((col("o_totalprice") * 10000).cast("long"))).count())
    time("agg no groups decimal")(
      orders.agg(sum(col("o_totalprice").cast("decimal(18,4)"))).count())
    spark.stop()
  }
}
