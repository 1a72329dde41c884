package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of the q102 IncAgg shape.
  * Usage: runMain graft.IncProfile [sfDir]
  */
object IncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[incprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm-up full query
    SparkEntry.queries("q102_inc_agg")(spark, sfDir).count()
    // micro: same agg, collect vs write, AQE on/off
    val ev0 = Tables.table(spark, sfDir, "events")
    def agg() = ev0.groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(col("value")).as("cnt"),
        sum(col("value").cast("decimal(28,6)")).as("sum"))
    for (r <- 1 to 2) {
      t(s"micro$r agg+collect")(agg().collect())
      val d1 = java.nio.file.Files.createTempDirectory("mic").toString
      t(s"micro$r agg+write(AQE on)")(
        agg().coalesce(1).write.mode("overwrite").parquet(d1 + "/x"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      t(s"micro$r agg+write(AQE off)")(
        agg().coalesce(1).write.mode("overwrite").parquet(d1 + "/y"))
      t(s"micro$r agg+write(AQE off, shuffle1)") {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        agg().coalesce(1).write.mode("overwrite").parquet(d1 + "/z")
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    for (round <- 1 to 2) {
      println(s"[incprofile] --- round $round ---")
      val ev = t("table")(Tables.table(spark, sfDir, "events"))
      val state = java.nio.file.Files
        .createTempDirectory("graft_incp").toString + "/state"
      val cut = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
      t("iter1") {
        graft.operators.IncAgg.run(ev.filter(col("ts") < cut),
          "ts", "1 day", Seq("event_type"), "value", state)
      }
      val fin = t("iter2") {
        graft.operators.IncAgg.run(ev, "ts", "1 day", Seq("event_type"),
          "value", state)
      }
      t("final count") {
        fin.select(col("event_type"), unix_millis(col("wstart")).as("w"),
            col("cnt")).coalesce(1).orderBy("event_type", "w").count()
      }
    }
    spark.stop()
  }
}
