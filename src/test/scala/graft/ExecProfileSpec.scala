package graft

/** The size gate itself: below [[ExecProfile.smallInputBytes]] a query
  * runs the single-job small profile; at/above it the scale profile
  * (AQE, planner broadcasts, 128 MB splits) returns. The gate is what
  * keeps the bench honest AND the ×10/×100 dirs on the real
  * configuration — worth pinning directly, not only via plan shapes. */
class ExecProfileSpec extends SparkSpec {

  test("small input -> single-job profile; >=1GiB -> scale profile") {
    ExecProfile.tune(spark, sf) // sf0.001: a few hundred KB
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(spark.conf.get("spark.sql.shuffle.partitions") ==
      ExecProfile.smallShufflePartitions.toString)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1")
    assert(spark.conf.get("spark.sql.join.preferSortMergeJoin") == "false")
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == "4m")
    // maybeBroadcast follows the profile: no hint on the small path
    val noHint = ExecProfile.maybeBroadcast(spark.range(3).toDF())
    assert(!noHint.queryExecution.logical.toString.contains("broadcast"))

    // a sparse file makes a >=1GiB dir without writing a gigabyte
    val dir = java.nio.file.Files.createTempDirectory("execprofile").toFile
    dir.deleteOnExit()
    val big = new java.io.RandomAccessFile(
      new java.io.File(dir, "big.parquet"), "rw")
    try big.setLength(ExecProfile.smallInputBytes)
    finally big.close()
    ExecProfile.tune(spark, dir.getAbsolutePath)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") ==
      spark.sparkContext.defaultParallelism.toString)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") ==
      "10485760")
    assert(spark.conf.get("spark.sql.join.preferSortMergeJoin") == "true")
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == "128m")
    val hinted = ExecProfile.maybeBroadcast(spark.range(3).toDF())
    assert(hinted.queryExecution.logical.toString.contains("broadcast"))

    ExecProfile.tune(spark, sf) // restore for later suites
  }

  test("boundedSort: identical rows and total order on both profiles; " +
      "single-task sort only under the small profile") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 997).toDF("id")
      .withColumn("k", pmod(col("id") * 7919, lit(101)))
      .select(col("k"), col("id"))
    def run() = ExecProfile.boundedSort(df, col("k"), col("id"))
    ExecProfile.tune(spark, sf) // small profile
    assert(ExecProfile.isSmall(spark))
    val small = run()
    assert(small.queryExecution.optimizedPlan.toString
      .contains("Repartition")) // single-task shape
    val smallRows = small.collect().toSeq
    // scale profile: flip the gate the same way tune() does
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      assert(!ExecProfile.isSmall(spark))
      val scale = run()
      assert(!scale.queryExecution.optimizedPlan.toString
        .contains("Repartition")) // plain global sort
      assert(scale.collect().toSeq == smallRows) // same rows, same order
    } finally ExecProfile.tune(spark, sf)
  }
}
