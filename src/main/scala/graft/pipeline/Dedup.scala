package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is one hash-shuffle on the text hash — never on the raw
  *    text, so the shuffle carries 8-byte keys + doc ids;
  *  - MinHash LSH shuffles (band-signature → bucket) pairs, bounding
  *    candidate generation to per-bucket cross products instead of the
  *    quadratic all-pairs join;
  *  - candidate verification (exact Jaccard) runs only on LSH candidates.
  * All signature math is column expressions (codegen), no UDFs.
  */
object Dedup {

  /** Exact dedup: canonical representative (min id) per distinct text.
    * Shuffles on xxhash64(text), not the text itself. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("_h", xxhash64(col(textCol)))
      .groupBy(col("_h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .drop("_h")

  /** Word-level n-gram shingles of a document.
    *
    * Built as a zip_with chain (`toks ⊗ toks[1:] ⊗ … ⊗ toks[n-1:]`) rather
    * than `transform(indices, i => toks(i)…toks(i+n-1))`: an expression
    * captured from outside a higher-order-function lambda is re-evaluated
    * PER ELEMENT, so the index form re-runs the regex tokenizer O(n·tokens)
    * times per document — zip_with arguments evaluate once per row. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val joined = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), size(toks)),
        (a, b) => concat_ws(" ", a, b))
    }
    // drop the <n-token tail shingles (unless the doc itself is shorter)
    array_distinct(slice(joined, lit(1), greatest(size(toks) - (n - 1), lit(1))))
  }

  /** MinHash signature columns `s0..s{k-1}`: k permutations simulated as
    * xxhash64(shingle, seed) minima — the standard public construction
    * (Broder '97). Shape matters at scale: explode(shingles) → one hash
    * aggregation with k `min` partials. The min() partials combine map-side,
    * so the shuffle carries one k-wide row per doc per input partition —
    * never the shingles. (A per-row array fold would instead get duplicated
    * into every consumer expression by projection collapse — ~100× blowup.) */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    val aggs = (0 until k).map(seed =>
      min(xxhash64(col("_sh"), lit(seed))).as(s"s$seed"))
    df.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), shingleN)).as("_sh"))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-duplicate candidate pairs.
    * Bands the k-row signature into `bands` groups of k/bands rows, buckets
    * on the hashed band signature, and emits candidate id pairs per bucket.
    * Wide ops: the signature aggregation, one shuffle on (band, bucket) and
    * the in-bucket self-join — candidate generation is bounded per bucket
    * instead of the quadratic all-pairs join. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, k: Int = 16,
                        bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(df, textCol, idCol, shingleN, k)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((0 until rows).map(r => col(s"s${b * rows + r}")) :+ lit(b): _*)
      }: _*)).as(Seq("band", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate pairs (verification
    * stage after LSH). `pairs` has id_a/id_b; docs joined twice. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, textCol: String,
                    idCol: String, shingleN: Int = 3,
                    threshold: Double = 0.7): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      shingles(col(textCol), shingleN).as("_sh"))
    pairs
      .join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"),
        "id_a")
      .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"),
        "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs above `threshold`.
    * Exact form — the verification tier; at corpus scale, bucket first with
    * [[graft.pipeline.Similarity.signBucket]] (sign-LSH) so the self-join
    * is per-bucket instead of |C|². Scoring uses the native codegen dot
    * kernel. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double): DataFrame = {
    graft.expressions.VectorExpressions.register(df.sparkSession)
    // per-row norms precomputed before the quadratic join (1 dot per pair)
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("_va"),
      sqrt(Similarity.dotNative(col(vecCol), col(vecCol))).as("_na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("_vb"),
      sqrt(Similarity.dotNative(col(vecCol), col(vecCol))).as("_nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.dotNative(col("_va"), col("_vb")) /
        (col("_na") * col("_nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, bitwise
    * weighted vote per bit position. Pure column math (fold over 64 bit
    * positions), no UDF. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t))
    (0 until 64).map { bit =>
      val mask = shiftleft(lit(1L), bit)
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0, 1L).otherwise(-1L))
      when(votes > 0, mask).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
