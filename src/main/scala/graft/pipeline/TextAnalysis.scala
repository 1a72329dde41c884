package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting. All are
  * narrow (per-row) transformations built from codegen'd built-ins — they
  * add zero shuffles and scale embarrassingly parallel over 100 TB of
  * documents. (The reference's closest analogue is the log-store UNNEST
  * regex extraction, `engine/immutable/unnest_func.go:103`.)
  */
object TextAnalysis {

  /** Whitespace token count (LongType). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish token count: alpha runs, digit runs, and single punctuation
    * marks each count as one token — a deterministic stand-in for a real
    * tokenizer's token count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Quality-score feature columns: length, token stats, punctuation and
    * stopword ratios. Returned as a struct so callers select what they need
    * (column pruning drops the rest at the scan). */
  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "on", "for", "with", "as", "at", "by")

  def qualityFeatures(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
      .cast("double")
    struct(
      length(text).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      (length(regexp_replace(text, "\\s", "")) / nTok).as("mean_word_len"),
      (nPunct / greatest(length(text).cast("double"), lit(1.0))).as("punct_ratio"),
      (nStop / nTok).as("stopword_ratio"))
  }

  /** Language-ID heuristic: score each candidate language by counting hits
    * of a small characteristic-stopword list, predict the argmax (ties →
    * lexicographically first language, deterministic). A real pipeline
    * swaps in fastText — the plumbing (per-row scores + argmax) is what
    * matters at scale. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "with", "for", "this"),
    "es" -> Seq("el", "la", "los", "las", "para"),
    "fr" -> Seq("le", "la", "les", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "für"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val pat = words.map(java.util.regex.Pattern.quote)
        .mkString("(?:^|\\s)(?:", "|", ")(?:\\s|$)")
      // regexp_count: same non-overlapping match count as
      // size(regexp_extract_all(...)) without materializing the match
      // array per row
      lang -> regexp_count(text, lit(pat)).cast("double")
    }

  def langId(text: Column): Column = {
    // argmax by score; ties keep the earlier (lexicographically-first)
    // language — a deterministic left fold over the per-language scores.
    val scored = langScores(text)
    val arr = array(scored.map { case (lang, s) =>
      struct(s.as("s"), lit(lang).as("l")) }: _*)
    val best = aggregate(slice(arr, 2, scored.size - 1), element_at(arr, 1),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc))
    best.getField("l")
  }

  /** Token-window document chunking with overlap — the standard
    * training-data preprocessing step (context-length-bounded chunks).
    * Returns an array of structs (chunk_idx, chunk_text); explode() it to
    * get one row per chunk. Narrow op: chunk fan-out happens before any
    * shuffle, so 100 TB of documents chunk at scan parallelism. */
  def chunk(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(overlap < chunkTokens, "overlap must be < chunk size")
    val stride = chunkTokens - overlap
    val toks = split(trim(text), "\\s+")
    val nChunks = greatest(
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.as("chunk_idx"),
        concat_ws(" ", slice(toks, i * stride + 1, lit(chunkTokens)))
          .as("chunk_text")))
  }

  /** PII redaction: emails, IPv4s, long digit runs → typed placeholders.
    * Chained codegen'd regexp_replace — per-row, shuffle-free. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]")
    regexp_replace(ip, "[0-9]{6,}", "[NUM]")
  }

  /** Quality filter verdict from [[qualityFeatures]]: the usual
    * length/stopword/punctuation gates of a pretraining pipeline. */
  def qualityKeep(features: Column, minTokens: Int = 20,
                  maxTokens: Int = 100000, minStopRatio: Double = 0.01,
                  maxPunctRatio: Double = 0.2): Column =
    features.getField("n_tokens").between(minTokens, maxTokens) &&
      features.getField("stopword_ratio") >= minStopRatio &&
      features.getField("punct_ratio") <= maxPunctRatio

  /** Rolling-hash document fingerprint (polynomial hash of the whitespace
    * tokens, mod 1e9+7 — keeps acc*31+crc32 inside Long under ANSI
    * overflow checking) — cheap near-exact dedup key; pure column math so
    * it stays in whole-stage codegen. */
  def fingerprint(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(31L) + crc32(t), lit(1000000007L)))
  }
}
