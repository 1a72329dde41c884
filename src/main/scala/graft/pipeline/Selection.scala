package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection scoring for training-data curation: DSIR-style
  * importance weights (Xie et al. '23, "Data Selection for Language
  * Models via Importance Resampling") — score each document by how much
  * its unigram distribution resembles a TARGET slice of the corpus
  * relative to the corpus overall, then resample/threshold on the score.
  *
  * This is the hashed-n-gram importance-weight shape of the paper with
  * two deliberate, documented substitutions that make the score an exact
  * integer (and therefore oracle-replayable bit-for-bit):
  *  - per-token weight is the smoothed COUNT RATIO
  *    `round(1e6 · (cnt_target(t) + 1) / (cnt_all(t) + V))` (V = vocab
  *    size, add-one smoothing) instead of the log-ratio — BIGINT after
  *    one correctly-rounded IEEE division, no libm;
  *  - features are raw unigrams rather than hashed bigrams; at corpus
  *    scale the join key would be `xxhash64(term)` (8-byte shuffle, the
  *    q23/q116 trick) — raw terms keep the oracle SQL joinable.
  *
  * Scale shape: one explode over tokens, two term-count aggregates
  * (map-side combining), one equi-join term→weight, one per-doc BIGINT
  * sum. The weight table is vocabulary-sized — it shuffles once and
  * would bucket/broadcast by term frequency at 100 TB; nothing is
  * quadratic and nothing collects.
  */
object Selection {

  /** Per-document DSIR importance score against a target slice.
    *
    * @param targetPred  boolean Column over `docs` rows selecting the
    *                    target distribution (e.g. `col("lang") === "en"`)
    * @return (doc_id, n_tok, score) — score = Σ_occurrences w(term)
    */
  def dsirScores(docs: DataFrame, textCol: String, idCol: String,
                 targetPred: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        targetPred.as("_tgt"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val weights = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("_all"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_t"))
    // V (vocab size) folds in as a broadcast one-row cross join — no
    // driver-side count action, the whole score is ONE query execution
    // (the smoothing arithmetic is identical: BIGINT + BIGINT, one
    // rounded IEEE division)
    val vRow = weights.agg(count(lit(1)).as("_v"))
    val wTbl = weights.crossJoin(broadcast(vRow)).select(col("term"),
      round(lit(1000000.0) * (col("_t") + lit(1L)) /
        (col("_all") + col("_v"))).cast("long").as("w"))
    toks.join(wTbl, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("score"))
  }
}
