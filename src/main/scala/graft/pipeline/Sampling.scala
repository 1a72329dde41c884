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
}
