package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer, trained on the corpus and applied to
  * it in one operator (Sennrich et al. '16, "Neural Machine Translation
  * of Rare Words with Subword Units" — the algorithm every GPT/Llama
  * tokenizer descends from).
  *
  * BPE trains on the WORD-FREQUENCY table, not the corpus: the classic
  * formulation (Sennrich §3.2) counts symbol pairs weighted by word
  * frequency, so the distributed part of training is exactly one
  * `groupBy(word).count()` over the tokenized corpus; the merge loop
  * then runs on a vocabulary-bounded table. The collect here is
  * therefore bounded by |vocab| (the same bounded-training-sample
  * contract as the IVF/PQ codebook collects in [[Similarity]]), never
  * by corpus size — at 100 TB the word-frequency table for a 1 M-type
  * vocabulary is a few MB.
  *
  * Apply is the reverse shape: the learned segmentation is a
  * vocab-sized word→subword-count map, broadcast back and equi-joined
  * against the exploded tokens — map-side only, no corpus shuffle
  * beyond the final per-doc aggregate.
  *
  * Determinism contract (replayed bit-for-bit by tools/oracle.py):
  * symbols are the word's codepoints plus a terminal `</w>`; each round
  * merges the pair with the highest frequency-weighted count, ties
  * broken by lexicographically smallest (left, right) pair; training
  * stops early when no pair occurs twice.
  */
object Bpe {

  /** End-of-word marker symbol (Sennrich §3.2). */
  val EndOfWord = "</w>"

  private def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  private def mergeOnce(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 &&
          syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` BPE merges from a (word, freq) table.
    * @return (merge list in order, word → final segmentation) */
  def trainOnFreqs(freqs: Seq[(String, Long)],
                   nMerges: Int): (Seq[(String, String)],
                                   Map[String, Vector[String]]) = {
    var segs = freqs.toVector.map { case (w, f) => (w, f, symbols(w)) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      segs.foreach { case (_, f, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        // max count; ties → lexicographically smallest (left, right)
        val pick = best.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += pick
        segs = segs.map { case (w, f, syms) =>
          (w, f, mergeOnce(syms, pick)) }
        round += 1
      }
    }
    (merges.result(), segs.map { case (w, _, syms) => w -> syms }.toMap)
  }

  /** One distributed pass: word-frequency table (vocab-bounded). */
  def wordFreqs(docs: DataFrame, textCol: String): Seq[(String, Long)] =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)

  /** Segment the corpus under a trained model: per-document token and
    * subword counts. Train-once-at-write-time is the deployment shape
    * (the model is a deterministic artifact of the corpus — cache it
    * keyed on the source fingerprint, the q109 lesson); unseen words
    * fall back to the untrained segmentation (|chars| + the terminal).
    *
    * @return (doc_id, n_tok, n_subtok) — n_subtok = Σ_tokens
    *         |segmentation(token)|
    */
  def segmentCounts(docs: DataFrame, textCol: String, idCol: String,
                    segs: Map[String, Vector[String]]): DataFrame = {
    // ship the vocab-sized word → |subwords| map as a foldable literal
    // decoded ONCE into a hash table inside the native TokenScoreSum
    // expression — no explode, no join, no shuffle, O(1) per token.
    // (The previous fold did element_at over a MAP LITERAL, which is a
    // linear scan of the literal per token: tokens × |vocab| work.)
    graft.expressions.VectorExpressions.register(docs.sparkSession)
    val nSub = typedLit(segs.map { case (w, s) => w -> s.length })
    docs.select(col(idCol).as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("_tk"))
      .select(col("doc_id"), size(col("_tk")).cast("long").as("n_tok"),
        call_function("token_score_sum", col("_tk"), nSub).as("n_subtok"))
  }
}
