package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-corpus shard writer — the SINK half of the curation
  * pipeline: after filtering/dedup/mixing, a corpus ships as a set of
  * fixed-token-budget shard files plus a manifest the training job
  * reads for scheduling and integrity checks (the WebDataset/
  * Megatron-style layout: shard = unit of shuffle and of resume).
  *
  * Shard assignment is a deterministic hash of the document id —
  * corpus-order-independent (re-running after an upstream change moves
  * only the changed documents), and every shard's expected token mass
  * is total/nShards with hash-uniform balance. The per-shard file is
  * written sorted by id so a shard's bytes are a pure function of its
  * membership.
  *
  * Scale shape: one sum aggregate for the shard count, one
  * `repartition(shard)` shuffle for the write (each output file
  * written by exactly one task — no driver fan-in), one reduced
  * aggregate for the manifest. The only collect is the manifest
  * (nShards rows, bounded by corpus_tokens / tokensPerShard).
  *
  * The manifest checksum is an order-independent BIT_XOR of
  * `xxhash64(doc_id, text)` — a reader can verify any shard in
  * isolation without re-sorting.
  */
object CorpusWriter {

  /** Write `docs` as token-budgeted shards under `outDir/data/shard=N/`
    * plus `outDir/manifest.json`.
    *
    * The manifest is one row per shard. Up to `maxManifestRows` shards it
    * is collected and inlined into manifest.json; ABOVE that the rows are
    * written distributed as JSON lines under `outDir/manifest_shards/`
    * and manifest.json carries a `shards_file` pointer instead — the
    * driver never materializes an unbounded row set (the same cap
    * pattern as the remote-read row limit; at the 2^20 shard clamp an
    * inline manifest would be ~100 MB of driver rows).
    * @return the manifest as a DataFrame:
    *         (shard, n_docs, n_tokens, min_id, max_id, checksum) —
    *         a local frame on the inline path, a lazy distributed frame
    *         on the pointer path
    */
  def writeShards(docs: DataFrame, textCol: String, idCol: String,
                  outDir: String, tokensPerShard: Long,
                  maxManifestRows: Int = 65536): DataFrame = {
    val withTok = docs.withColumn("_ntok",
      TextAnalysis.tokenCount(col(textCol)))
    // sum() over zero rows is NULL — an empty corpus writes an empty
    // manifest instead of throwing from getLong
    val total = Option(withTok.agg(sum(col("_ntok"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    require(tokensPerShard > 0, s"tokensPerShard must be > 0: $tokensPerShard")
    // Clamp the shard count: a tiny tokensPerShard against a large
    // corpus would otherwise request millions of shuffle partitions.
    // 2^20 shards ≈ 1 B-token shards at a 1 T-token corpus; beyond that
    // each shard simply carries more than the requested budget.
    val nShards = math.min(1L << 20,
      math.max(1L, (total + tokensPerShard - 1) / tokensPerShard))
    val sharded = withTok.withColumn("shard",
        pmod(xxhash64(col(idCol)), lit(nShards)))
      // the per-row hash ships IN the data files so any reader can
      // recompute a shard's checksum without knowing the hash function
      // of this engine (and the manifest oracle recomputes it externally)
      .withColumn("_h", xxhash64(col(idCol), col(textCol)))
    sharded
      .repartition(nShards.toInt, col("shard"))
      .sortWithinPartitions(col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(s"$outDir/data")
    // The manifest aggregates the WRITTEN files, not the source plan:
    // `sharded` would re-read and re-tokenize the whole corpus a third
    // time (tokenCount + xxhash64 over every text), while the data
    // files already carry _ntok and _h — the manifest pass is then a
    // columnar scan of three small columns + the 8-byte shard shuffle,
    // and it doubles as a read-back of what actually landed on disk.
    // (empty corpus: no data files to infer a schema from — fall back
    // to the source plan's empty aggregate)
    // the declared schema skips the read-back's schema-inference job
    // (the written layout is this plan's own schema; `shard` resolves
    // as the partition column, declared long so no cast is needed)
    val manifestSrc =
      if (total == 0L) sharded
      else docs.sparkSession.read.schema(sharded.schema)
        .parquet(s"$outDir/data")
    // No orderBy here: a global sort pays a range-partition sampling job
    // that re-runs the aggregation; the inline path sorts the collected
    // rows on the driver (nShards-bounded) and the pointer path sorts
    // only where the written layout needs it.
    val manifest = manifestSrc
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_ntok")).as("n_tokens"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        expr("bit_xor(_h)").as("checksum"))
    def writeJson(json: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, "manifest.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    }
    if (nShards > maxManifestRows) {
      // pointer path: shard rows stay distributed (checksum as string —
      // JSON doubles round past 2^53)
      manifest.orderBy("shard")
        .withColumn("checksum", col("checksum").cast("string"))
        .write.mode(SaveMode.Overwrite).json(s"$outDir/manifest_shards")
      writeJson(s"""{"n_shards":$nShards,"total_tokens":$total,""" +
        s""""tokens_per_shard":$tokensPerShard,""" +
        s""""shards_file":"manifest_shards"}""")
      manifest.orderBy("shard")
    } else {
      val rows = manifest.collect().sortBy(_.getLong(0))
      val body = rows.map { r =>
        s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
          s""""n_tokens":${r.getLong(2)},"min_id":${r.getLong(3)},""" +
          // checksum is a full 64-bit value — JSON doubles round past
          // 2^53, so it ships as a string
          s""""max_id":${r.getLong(4)},"checksum":"${r.getLong(5)}"}"""
      }.mkString("[", ",", "]")
      writeJson(s"""{"n_shards":$nShards,"total_tokens":$total,""" +
        s""""tokens_per_shard":$tokensPerShard,"shards":$body}""")
      // return the rows already collected for the manifest file — a local
      // frame, so downstream actions don't re-aggregate the whole corpus
      // (the manifest is nShards rows by construction)
      docs.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), manifest.schema)
    }
  }

  /** Verify a written corpus against its own manifest: recompute every
    * shard's (n_docs, n_tokens, checksum) from the data files and diff.
    * @return rows only for mismatched shards — empty means intact */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
                   outDir: String, textCol: String,
                   idCol: String): DataFrame = {
    val data = spark.read.parquet(s"$outDir/data")
    val recomputed = data.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"),
        expr(s"bit_xor(xxhash64($idCol, $textCol))").as("checksum"))
    val man = MiniManifest.read(spark, outDir)
    man.alias("m").join(recomputed.alias("r"), Seq("shard"), "full_outer")
      .filter(!(col("m.n_docs") <=> col("r.n_docs")) ||
        !(col("m.n_tokens") <=> col("r.n_tokens")) ||
        !(col("m.checksum") <=> col("r.checksum")))
  }

  private object MiniManifest {
    def read(spark: org.apache.spark.sql.SparkSession,
             outDir: String): DataFrame = {
      import spark.implicits._
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(outDir, "manifest.json")), "UTF-8")
      val obj = graft.server.MiniJson.parseObject(json)
      obj.get("shards_file") match {
        case Some(f) =>
          // pointer form: shard rows live as distributed JSON lines
          spark.read.json(s"$outDir/${String.valueOf(f)}")
            .select(col("shard").cast("long"),
              col("n_docs").cast("long"), col("n_tokens").cast("long"),
              col("checksum").cast("long"))
        case None =>
          val shards = obj("shards").asInstanceOf[Seq[Any]]
          shards.map { s =>
            val m = s.asInstanceOf[Map[String, Any]]
            def l(k: String): Long = m(k) match {
              case d: Double => d.toLong
              case x: Long => x
              case other => String.valueOf(other).toLong
            }
            (l("shard"), l("n_docs"), l("n_tokens"),
              m("checksum").asInstanceOf[String].toLong)
          }.toDF("shard", "n_docs", "n_tokens", "checksum")
      }
    }
  }
}
