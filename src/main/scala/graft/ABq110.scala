package graft

// SCRATCH dev tool for the round-18 q110 shingle-fusion A/B — interleaved
// in-JVM reps of variant A (round-17 shape: separate exact-text checkpoint +
// jaccardSelfJoin's internal shingle checkpoint + decontamination
// re-tokenization) vs variant B (fused checkpoint + reuse). NOT part of the
// declared surface; delete before commit.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

object ABq110 {
  // mode 0: round-17 shape (separate checkpoints, semi-join exact dedup)
  // mode 1: fused checkpoint, semi-join exact dedup
  // mode 2: fused checkpoint, window-min exact dedup (one withFp pass)
  // mode 3: fused checkpoint, min_by-struct exact dedup (one withFp pass)
  def build(s: SparkSession, dir: String, mode: Int): DataFrame = {
    val fused = mode >= 1
    val docs = Tables.table(s, dir, "documents").select("doc_id", "lang", "text")
    val q = docs.filter(
      TextAnalysis.qualityKeep(TextAnalysis.qualityFeatures(col("text"))))
    val withFp = q.withColumn("_fp", TextAnalysis.fingerprint(col("text")))
    val exactBase = mode match {
      case 2 =>
        withFp.withColumn("_keep", min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("_fp")))
          .filter(col("doc_id") === col("_keep"))
          .drop("_fp", "_keep")
      case m if m >= 3 =>
        withFp.groupBy("_fp")
          .agg(min_by(struct(col("doc_id"), col("lang"), col("text")),
            col("doc_id")).as("_r"))
          .select(col("_r.doc_id"), col("_r.lang"), col("_r.text"))
      case _ =>
        val exactKeep = withFp.groupBy("_fp")
          .agg(min(col("doc_id")).as("doc_id"))
        withFp.join(exactKeep.select("doc_id"),
          Seq("doc_id"), "left_semi").drop("_fp")
    }
    val exact =
      if (fused) exactBase.withColumn("_sh", Dedup.shingles(col("text"), 3))
        .localCheckpoint()
      else exactBase.localCheckpoint()
    val pairs =
      if (fused) Dedup.jaccardSelfJoinPre(exact, "doc_id", "_sh", 0.8)
      else Dedup.jaccardSelfJoin(exact, "text", "doc_id", 3, 0.8)
    val cc = Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("component"))
    val clustered = (if (mode >= 1) exact.drop("_sh") else exact)
      .join(cc, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("_nt", TextAnalysis.tokenCount(col("text")))
      .localCheckpoint()
    val kept =
      if (mode >= 4)
        clustered.groupBy("cluster")
          .agg(min_by(struct(col("doc_id"), col("lang"), col("text")),
            struct((-col("_nt")).as("neg"), col("doc_id").as("id"))).as("_r"))
          .select(col("_r.doc_id").as("doc_id"), col("_r.lang").as("lang"),
            col("_r.text").as("text"))
      else {
        val best = clustered.groupBy("cluster")
          .agg(min(struct((-col("_nt")).as("neg"), col("doc_id").as("id")))
            .getField("id").as("doc_id"))
        clustered.join(best.select("doc_id"), Seq("doc_id"), "left_semi")
      }
    val benchGrams = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(Dedup.shingles(col("text"), 3)).as("gram"))
      .distinct()
    val contaminated =
      (if (mode >= 1)
        exact.select(col("doc_id"), col("_sh"))
          .join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), explode(col("_sh")).as("gram"))
      else
        kept.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3))
          .as("gram")))
        .join(broadcast(benchGrams), "gram")
        .select("doc_id").distinct()
    val clean = kept.filter(col("doc_id") % 50 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    clean.select(col("lang"), col("doc_id"),
        explode(TextAnalysis.chunk(col("text"), 40, 10)).as("_ch"))
      .groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"))
      .coalesce(1)
      .orderBy("lang")
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 4
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
    ExecProfile.tune(spark, sfDir)
    val modes = if (args.length > 1)
      args(1).split(',').map(_.toInt) else Array(0, 1, 2, 3)
    def run(mode: Int): Double = {
      val t0 = System.nanoTime()
      val df = build(spark, sfDir, mode)
      df.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      SparkEntry.releaseCheckpoints(df)
      s
    }
    modes.foreach(run) // warmups, one per variant (codegen/JIT)
    (0 until reps).foreach { k =>
      val line = modes.map(m => f"m$m=${run(m)}%.3f").mkString("  ")
      println(s"[ab] rep$k $line")
    }
    spark.stop()
  }
}
