package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (BM25) and hybrid (reciprocal-rank-fusion) retrieval over the
  * document corpus — the curation-side complement to the ANN family: a
  * training-data / RAG pipeline ranks candidate documents both by sparse
  * term match and by dense embedding similarity, then fuses the two
  * rankings (the standard "hybrid search" shape).
  *
  * Scale design:
  *  - the postings build is one explode + one (term, doc) reduction —
  *    exactly the q116 gram shape, shuffling counts not text;
  *  - document-frequency and query-term tables are tiny aggregates that
  *    BROADCAST into the scoring join (a handful of query terms × corpus
  *    postings — the corpus side never reshuffles);
  *  - per-query top-k goes through the bounded-heap `topk_rows`
  *    aggregate, so only k rows per query per task cross the shuffle —
  *    never a corpus-wide window sort;
  *  - RRF fuses two rank frames with one full-outer equi-join on
  *    (query, candidate) — rank frames are k rows per query by
  *    construction, so the fusion input is bounded regardless of corpus
  *    size.
  *
  * Determinism (the oracle contract): the scoring avoids transcendental
  * functions — idf is the SQUARE ROOT of the classic idf odds
  * `(N - df + 0.5)/(df + 0.5)` rather than its log (sqrt is a correctly
  * rounded IEEE-754 op, `ln` is libm-dependent and differs between
  * engines in the last ulp), a monotone-equivalent per-term compression.
  * Per-(doc, term) contributions round to 6 dp and sum as DECIMAL, so the
  * per-doc score is independent of partial-aggregation order and
  * hash-exact vs an external SQL replay.
  */
object Retrieval {

  /** Whitespace postings: one row per (doc, term) with the term frequency
    * and the document length in tokens. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(lower(trim(col(textCol))), "\\s+").as("_tk"))
    toks.select(col("doc_id"), size(col("_tk")).cast("long").as("dl"),
        explode(col("_tk")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** Per-query top-k rows by `score` desc (ties → lowest id) via the
    * bounded-heap aggregate — same shuffle contract as the ANN rankers. */
  private def topK(df: DataFrame, k: Int, qCol: String, idCol: String,
                   scoreCol: String): DataFrame = {
    graft.expressions.TopKRows.register(df.sparkSession)
    val payload = df.columns.toSeq
    val st = struct(Seq(col(scoreCol).as("_tk_s0"),
      col(idCol).as("_tk_s1")) ++ payload.map(col): _*)
    df.groupBy(col(qCol))
      .agg(call_function("topk_rows", st, lit(k), lit(2), lit("DA"))
        .as("_top"))
      .select(posexplode(col("_top")).as(Seq("_pos", "_row")))
      .select(payload.map(c => col(s"_row.$c").as(c)) :+
        (col("_pos") + 1).as("rank"): _*)
  }

  /** BM25 top-k for a set of (query_id, whitespace query text) pairs.
    * k1/b are the textbook defaults; idf is the sqrt-odds variant (see
    * object scaladoc). Returns (query_id, doc_id, rank, score). */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Literal queries compile to pure expressions — an isin() vocab
    // filter below the shuffle and a term → query_ids literal-map
    // explode instead of a join — so no broadcast of a local relation
    // ever schedules a job; the only side subtree is the corpus stats.
    val byTerm: Map[String, Seq[Long]] = queries
      .flatMap { case (qid, t) =>
        t.trim.toLowerCase.split("\\s+").distinct.map(_ -> qid) }
      .groupBy(_._1).map { case (t, qs) => t -> qs.map(_._2).sorted }
    val vocab = byTerm.keys.toSeq.sorted
    bm25Scored(docs, textCol, idCol,
      expand = _.filter(col("term").isin(vocab: _*))
        .select(col("*"),
          explode(element_at(typedLit(byTerm), col("term")))
            .as("query_id")),
      k = k, k1 = k1, b = b)
  }

  /** BM25 with the query set supplied as a (query_id, term) DataFrame —
    * the query-by-example path (queries drawn from the corpus itself)
    * stays fully in-plan, no driver-side collect of query texts. */
  def bm25TopKTerms(docs: DataFrame, textCol: String, idCol: String,
                    qTerms: DataFrame, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    // The query-term joins MUST broadcast at every size: a shuffle join
    // would move the vocab prune ABOVE the (doc, term) exchange,
    // shuffling every exploded token of the corpus instead of only
    // query-term hits (measured: +0.28 s at sf0.1; catastrophic at
    // 100 TB). The prune is a SEMI join below the aggregation and the
    // query fan-out attaches AFTER it — fusing the two into one pre-agg
    // inner join was measured 36% slower at ×10 (the fan-out multiplies
    // every shuffled occurrence by its query count); two broadcast
    // builds of the small side are cheaper than one fatter exchange.
    // (measured, round 17: the two broadcasts cannot collapse into one
    // reused exchange — column pruning rewrites the semi build to a
    // [term]-only subtree whatever shape is passed, so the builds never
    // canonicalize equal. The distinct-shuffle below them IS reused.)
    bm25Scored(docs, textCol, idCol,
      expand = _.join(broadcast(qTerms.select(col("term"))),
        Seq("term"), "left_semi"),
      attach = Some(_.join(broadcast(qTerms), Seq("term"))),
      k = k, k1 = k1, b = b)

  /** Shared BM25 scoring pipeline. `expand` restricts exploded tokens
    * to the query vocabulary BELOW the aggregation shuffle (so only
    * matching occurrences leave the scan stage) and may already attach
    * `query_id` (the literal-map path, where the fan-out is a pure
    * expression); `attach` optionally fans the aggregated postings out
    * to query ids AFTER the (doc, term) reduction — the cheaper order
    * when the fan-out is a real join. */
  private def bm25Scored(docs: DataFrame, textCol: String, idCol: String,
                         expand: DataFrame => DataFrame,
                         attach: Option[DataFrame => DataFrame] = None,
                         k: Int, k1: Double, b: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(lower(trim(col(textCol))), "\\s+").as("_tk"))
    val expanded = expand(toks
      .select(col("doc_id"), size(col("_tk")).cast("long").as("dl"),
        explode(col("_tk")).as("term")))
    val aggKeys =
      if (attach.isEmpty) Seq(col("query_id"), col("doc_id"), col("term"))
      else Seq(col("doc_id"), col("term"))
    // df per query term falls out of the same pruned table: the agg
    // output is unique per its keys by construction, so df = plain
    // count per (query-scoped) term via a window over a bounded frame —
    // no countDistinct, no second tokenize-the-corpus pass.
    val dfWindow =
      if (attach.isEmpty)
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"), col("term"))
      else org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val reduced = expanded
      .groupBy(aggKeys: _*)
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("df", count(lit(1)).over(dfWindow))
    val post = attach.map(_(reduced)).getOrElse(reduced)
    // N and avgdl: a one-row corpus aggregate folded in as a broadcast
    // single-row cross join — no driver-side stats action. Token count
    // = size of the split array (incl. the empty-string token of a
    // blank doc) — measured faster than the regexp_count(separator
    // runs)+1 equivalent, whose regex engine re-scans the full text.
    // sum over BIGINT is exact; the avgdl division is a single
    // correctly-rounded IEEE op, same as the oracle's.
    val stats = docs.agg(count(lit(1)).as("_n"),
      sum(size(split(lower(trim(col(textCol))), "\\s+")).cast("long"))
        .as("_s"))
    val scored = post
      .crossJoin(graft.ExecProfile.maybeBroadcast(stats))
      .withColumn("_idf",
        sqrt((col("_n").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("_tff",
        (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * (col("dl") /
              (col("_s").cast("double") / col("_n"))))))
      .withColumn("_c",
        round(col("_idf") * col("_tff"), 6).cast("decimal(20,6)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_c")).as("_dscore"))
      .select(col("query_id"), col("doc_id"),
        col("_dscore").cast("double").as("score"))
    topK(scored, k, "query_id", "doc_id", "score")
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. '09): given two rank frames
    * (query_id, doc_id, rank), fuse as Σ 1/(c + rank) over the arms a
    * candidate appears in. Full-outer on (query, candidate) — inputs are
    * k rows per query, so the fusion is corpus-size-independent. */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Int, k: Int): DataFrame = {
    val la = a.select(col("query_id"), col("doc_id"), col("rank").as("_ra"))
    val lb = b.select(col("query_id"), col("doc_id"), col("rank").as("_rb"))
    val fused = la.join(lb, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c.toDouble) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("_rb")), lit(0.0)))
    topK(fused, k, "query_id", "doc_id", "rrf")
      .select(col("query_id"), col("doc_id"), col("rank"),
        round(col("rrf"), 6).as("rrf"))
  }
}
