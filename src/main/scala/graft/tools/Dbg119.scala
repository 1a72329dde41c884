package graft.tools

import org.apache.spark.sql.SparkSession

object Dbg119 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/sfscale/sf100_mut"
    val df = graft.SparkEntry.queries("q119_semdedup")(spark, dir)
    val t0 = System.nanoTime()
    val dups = df.filter("is_dup").count()
    println(f"[dbg119] dups=$dups exec=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
