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
    val wTbl = weights.crossJoin(graft.ExecProfile.maybeBroadcast(vRow))
      .select(col("term"),
      round(lit(1000000.0) * (col("_t") + lit(1L)) /
        (col("_all") + col("_v"))).cast("long").as("w"))
    toks.join(wTbl, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("score"))
  }

  /** CCNet-style language-model quality bucketing (Wenzek et al. '20,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" §4.3): score every document under a language model trained on
    * the corpus itself, then split the corpus into head/middle/tail
    * thirds by per-token score. CCNet scores with an external KenLM
    * 5-gram model; here the model is an add-one-smoothed BIGRAM LM
    * fitted to the input corpus in the same plan — self-contained, and
    * the conditional p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) is the textbook
    * estimator. As with [[dsirScores]], the per-bigram weight is the
    * exactly-rounded integer `round(1e6 · p)` so per-doc sums are BIGINT
    * and bit-replayable by the SQL oracle — the log of the paper's
    * perplexity is monotone in neither direction of this sum, but the
    * HEAD/MIDDLE/TAIL split only needs a per-token ORDER, and avg-weight
    * order ≡ avg-probability order.
    *
    * Scale shape: one bigram explode (array slide, no self-join), two
    * count aggregates with map-side combining (the (w1,w2) table is
    * vocabulary²-bounded and independent of corpus size), one equi-join
    * bigram→weight (hash the pair to `xxhash64(w1,w2)` at 100 TB; raw
    * strings keep the oracle joinable), one per-doc BIGINT sum. The
    * ntile(3) split runs a single-partition window over the PER-DOC
    * frame — at 100 TB replace it with the CCNet recipe itself:
    * thresholds from a sample, broadcast, map-side bucket assignment.
    *
    * @return (doc_id, n_bigrams, score, bucket) — bucket 1=head (highest
    *         avg conditional probability), 2=middle, 3=tail
    */
  def bigramLmBuckets(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("_tk"))
      .filter(size(col("_tk")) >= 2)
    val bigrams = tk.select(col("doc_id"),
      explode(expr("transform(sequence(2, size(_tk)), " +
        "i -> struct(_tk[i - 2] AS w1, _tk[i - 1] AS w2))")).as("_b"))
      .select(col("doc_id"), col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    // ONE explode pass (the q116 shape): reduce to per-doc bigram
    // counts first, then both the corpus model and the per-doc scores
    // derive from the reduced frame — the naive two-pass (corpus counts
    // + corpus re-join) re-explodes every document, measured ~2× this
    val docBg = bigrams.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("_cnt"))
    val c12 = docBg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("_cnt")).as("_c12"))
    // conditional denominator c(w1·) = Σ_w2 c(w1,w2) — derived from the
    // reduced bigram table, not a second pass over the corpus
    val c1 = c12.groupBy(col("w1")).agg(sum(col("_c12")).as("_c1"))
    // V = distinct token types across ALL positions (w2 of the last
    // bigram covers final tokens; w1 covers the rest — union of both
    // sides of the reduced table, still corpus-size-independent)
    val vRow = c12.select(col("w1").as("t"))
      .union(c12.select(col("w2").as("t")))
      .agg(countDistinct(col("t")).as("_v"))
    val wTbl = c12.join(c1, Seq("w1"))
      .crossJoin(graft.ExecProfile.maybeBroadcast(vRow))
      .select(col("w1"), col("w2"),
        round(lit(1000000.0) * (col("_c12") + lit(1L)) /
          (col("_c1") + col("_v"))).cast("long").as("w"))
    // no broadcast() hint: both join sides hang off the SAME docBg
    // shuffle, so AQE reuses that exchange and then broadcasts the
    // (measured-tiny) wTbl side at runtime — a hint would force a
    // separate broadcast job that re-executes the explode subtree
    // (measured: 3 jobs / 1.25 s hinted vs 2 jobs / 1.11 s AQE)
    val perDoc = docBg.join(wTbl, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_cnt")).as("n_bigrams"),
        sum(col("_cnt") * col("w")).as("score"))
    // avg-weight order: one correctly-rounded IEEE division on both
    // engines → identical sort keys; doc_id breaks exact-ratio ties
    val ord = org.apache.spark.sql.expressions.Window.orderBy(
      (col("score").cast("double") / col("n_bigrams")).desc,
      col("doc_id").asc)
    perDoc.withColumn("bucket", ntile(3).over(ord))
  }

  /** Supervised quality classifier as a LINEAR PROBE over hashed
    * bag-of-words features, trained in one distributed pass — the
    * fasttext-shaped "learn what the target slice looks like" scorer
    * every curation stack runs, in the pattern big-data ML actually
    * uses: EXACT distributed sufficient statistics + a bounded driver
    * solve (the same split as the IVF Lloyd steps).
    *
    * Features: token counts hashed into `dim` buckets
    * (`pmod(xxhash64(term), dim)`) plus an intercept — all integers,
    * so the normal-equation sufficient statistics A = Σ x·xᵀ and
    * b = Σ y·x are BIGINT-exact under any aggregation order. The
    * (dim+1)² matrix collects (bounded, corpus-size-independent), the
    * driver solves the ridge system (A + λI)w = b with the
    * deterministic partial-pivot elimination documented in
    * tools/oracle.py (bit-replayable: exact integer inputs + a fixed
    * f64 operation sequence), and scoring re-joins the broadcast
    * integer microweights W = round(w·1e9) so per-doc scores are again
    * BIGINT-exact: score = Σ count_j · W_j.
    *
    * Scale shape: one token explode → (doc, bucket) count reduction;
    * a per-doc self-join for the outer products (≤(dim+1)² pairs per
    * doc, equi-join on doc_id — at huge corpora a mapPartitions
    * outer-product partial would cut the constant, same result);
    * one (dim+1)²-key aggregate; broadcast weights; one per-doc sum.
    *
    * @return (doc_id, n_tok, label, score) — score = Σ c_j·W_j
    */
  def linearProbe(docs: DataFrame, textCol: String, idCol: String,
                  targetPred: Column, dim: Int = 32,
                  ridge: Double = 1.0): DataFrame = {
    val micro = probeWeights(docs, textCol, idCol, targetPred, dim, ridge)
    probeScore(docs, textCol, idCol, targetPred, micro, dim)
  }

  private def featFrame(docs: DataFrame, textCol: String, idCol: String,
                        targetPred: Column, dim: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        targetPred.cast("long").as("_y"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val bc = toks
      .withColumn("_b", pmod(xxhash64(col("term")), lit(dim.toLong)) + 1L)
      .groupBy(col("doc_id"), col("_y"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    // intercept = bucket 0, count 1 per doc
    bc.unionByName(bc.select(col("doc_id"), col("_y")).distinct()
      .select(col("doc_id"), col("_y"), lit(0L).as("_b"),
        lit(1L).as("_c")))
  }

  /** Train: the model artifact (integer microweights) — deterministic
    * in the corpus, so callers should cache it keyed on the source
    * fingerprint (the write-time shape; q130 does). */
  def probeWeights(docs: DataFrame, textCol: String, idCol: String,
                   targetPred: Column, dim: Int = 32,
                   ridge: Double = 1.0): Array[Long] = {
    val n = dim + 1
    val feats = featFrame(docs, textCol, idCol, targetPred, dim)
    val aRows = feats.alias("l")
      .join(feats.alias("r"), Seq("doc_id"))
      .groupBy(col("l._b").as("i"), col("r._b").as("j"))
      .agg(sum(col("l._c") * col("r._c")).as("s"))
      .collect()
    val bRows = feats.groupBy(col("_b").as("i"))
      .agg(sum(col("_y") * col("_c")).as("s")).collect()
    val A = Array.fill(n, n)(0.0)
    aRows.foreach(r => A(r.getLong(0).toInt)(r.getLong(1).toInt) =
      r.getLong(2).toDouble)
    (0 until n).foreach(i => A(i)(i) += ridge)
    val bv = Array.fill(n)(0.0)
    bRows.foreach(r => bv(r.getLong(0).toInt) = r.getLong(1).toDouble)
    solveInPlace(A, bv).map(x => math.round(x * 1e9))
  }

  /** Score under trained microweights: pure plan, no training jobs. */
  def probeScore(docs: DataFrame, textCol: String, idCol: String,
                 targetPred: Column, micro: Array[Long],
                 dim: Int = 32): DataFrame = {
    val feats = featFrame(docs, textCol, idCol, targetPred, dim)
    // weights attach as an O(1) ARRAY-literal lookup (round 18): the
    // former broadcast(wTbl) join scheduled a broadcast-build job per
    // query just to ship dim+1 longs the driver already holds (even a
    // LocalRelation build is a parallelize job). _b ∈ [0, dim] by
    // featFrame's construction, so the lookup is total — identical rows
    // to the equi-join. (Array literal, not map literal — element_at on
    // a map literal is a per-lookup linear scan, the round-13 q124 bug.)
    val wArr = typedlit(micro.toIndexedSeq)
    feats.withColumn("_w", element_at(wArr, (col("_b") + 1L).cast("int")))
      .groupBy(col("doc_id"), col("_y").as("label"))
      .agg(sum(when(col("_b") === 0L, 0L).otherwise(col("_c")))
          .as("n_tok"),
        sum(col("_c") * col("_w")).as("score"))
      .select(col("doc_id"), col("n_tok"), col("label"), col("score"))
  }

  /** Deterministic partial-pivot Gaussian elimination, replayed
    * op-for-op by tools/oracle.py — keep both in sync. */
  private[graft] def solveInPlace(a: Array[Array[Double]],
                                     b: Array[Double]): Array[Double] = {
    val n = b.length
    var k = 0
    while (k < n) {
      var p = k; var r = k + 1
      while (r < n) {
        if (math.abs(a(r)(k)) > math.abs(a(p)(k))) p = r
        r += 1
      }
      if (p != k) {
        val tmp = a(p); a(p) = a(k); a(k) = tmp
        val tb = b(p); b(p) = b(k); b(k) = tb
      }
      r = k + 1
      while (r < n) {
        val f = a(r)(k) / a(k)(k)
        var c = k
        while (c < n) { a(r)(c) = a(r)(c) - f * a(k)(c); c += 1 }
        b(r) = b(r) - f * b(k)
        r += 1
      }
      k += 1
    }
    val x = Array.fill(n)(0.0)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s = s - a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }
}
