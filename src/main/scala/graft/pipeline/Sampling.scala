package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing for training-data pipelines.
  *
  * All selection is by key hash, not rand(): the same row set is chosen on
  * every run, on any cluster size, and re-runs of a 100 TB job are
  * reproducible (rand()-based sampling changes under retries/repartition).
  * Pure column predicates → pushed next to the scan, shuffle-free.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~fraction of rows, chosen by xxhash64(key) bucket. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol)), lit(Buckets)) <
      lit((fraction * Buckets).toLong))

  /** Per-stratum fractions (e.g. per language): strata not listed are
    * dropped. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val bucket = pmod(xxhash64(col(keyCol)), lit(Buckets))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && bucket < lit((f * Buckets).toLong))
    }
    df.filter(keep)
  }

  /** Weighted mix of sources into one dataset: each source is hash-sampled
    * to its weight and union'd with a provenance column. Weights are
    * fractions of each source kept (not output ratios). */
  def mix(sources: Seq[(String, DataFrame, Double)], keyCol: String): DataFrame =
    sources.map { case (name, df, weight) =>
      sampleByHash(df, keyCol, weight).withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)

  /** Uniform n-row sample without replacement, seeded: rank rows by a
    * seeded key hash and take the first n. Same selection distribution a
    * reservoir draw gives (every n-subset equally likely under hash
    * uniformity), but deterministic under retries and executed as a
    * distributed TakeOrdered (per-partition heaps) instead of a
    * driver-side reservoir. Reference: sample() reservoir,
    * `query/agg_functions.go`. */
  def sampleN(df: DataFrame, keyCol: String, n: Int,
              seed: Long = 0L): DataFrame =
    df.orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol)).limit(n)

  /** 80/10/10 knuth-hash split thresholds over [0, 2^31-1): exact
    * integer literals shared with the SQL oracle (floor(0.8·m)+1,
    * floor(0.9·m)+1 for m = 2147483647). */
  val SplitT1 = 1717986918L
  val SplitT2 = 1932735283L

  /** Leakage-safe train/val/test split: assign every EXACT-DUP CLUSTER
    * (not every document) to a split, so no duplicated text ever
    * straddles the train/eval boundary — the standard contamination
    * trap when corpora are split per-document before dedup (Lee '22
    * §6, Dodge '21). The cluster representative is min(doc_id) over
    * identical text; the split is a deterministic Knuth multiplicative
    * hash of the representative (the q67/q118 bucket arithmetic — SQL-
    * replayable, no RNG). The output also quantifies the counterfactual:
    * `naive_leaked` = clusters in this split whose members would have
    * landed in ≥2 different splits under the per-document hash.
    *
    * Scale shape: one partially-aggregated text-keyed exchange (at
    * 100 TB the grouping key is `xxhash64(text)` — 8-byte shuffle; the
    * raw text grouping here keeps the oracle joinable), then one
    * reduced aggregate. Nothing collects; nothing is quadratic.
    *
    * @return (split, n_docs, n_clusters, naive_leaked) ordered by split
    */
  def leakageSafeSplit(docs: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    def hb(c: Column): Column =
      pmod(pmod(c, lit(2147483647L)) * lit(2654435761L), lit(2147483647L))
    def splitOf(c: Column): Column =
      when(hb(c) < SplitT1, "train")
        .when(hb(c) < SplitT2, "val")
        .otherwise("test")
    // One aggregation per exact-text cluster instead of a window-min plus
    // a second (rep, split) aggregation (round 17): the representative
    // min(id) is unique per text group (each min id belongs to exactly
    // one group), so grouping by text IS grouping by cluster — the
    // window's full sort-shuffle of every (text, id) row collapses into
    // one partially-aggregated exchange, and the (rep, split) re-shuffle
    // disappears outright. Same rows, same schema, oracle-identical.
    val perCluster = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("rep"), count(lit(1)).as("_n"),
        countDistinct(splitOf(col(idCol))).as("_ns"))
    perCluster.groupBy(splitOf(col("rep")).as("split"))
      .agg(sum(col("_n")).as("n_docs"),
        count(lit(1)).as("n_clusters"),
        sum(when(col("_ns") > 1, 1L).otherwise(0L)).as("naive_leaked"))
      // 3 fixed split rows: single-partition total order, no range-
      // sampling job
      .repartition(1).sortWithinPartitions("split")
  }
}
