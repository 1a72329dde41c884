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

  /** EXACT Jaccard self-join at threshold `t` without pair enumeration —
    * the prefix filter from the set-similarity-join literature (Bayardo
    * et al. '07 "Scaling Up All Pairs", Xiao et al. '08 PPJoin): under
    * any global total order on grams, a pair with J ≥ t must share a
    * gram inside each side's first ⌊(1−t)·|A|⌋+1 grams. (Proof: let g be
    * the globally-smallest shared gram; if g were outside A's prefix,
    * A would hold ≥ ⌊(1−t)|A|⌋+1 unshared grams, so |A∩B| < t|A| ≤
    * t|A∪B|.) So: order grams rarest-first (minimizes candidates),
    * explode only prefixes, equi-join on the gram, verify candidates
    * exactly. Every stage is a shuffle-by-key — no cartesian, no BNLJ —
    * and the verify set is bounded by co-occurrence in rare grams.
    * Returns the same rows as an all-pairs scan at the same threshold. */
  def jaccardSelfJoin(docs: DataFrame, textCol: String, idCol: String,
                      shingleN: Int = 3,
                      threshold: Double = 0.8): DataFrame = {
    // shingle once: the arrays feed gram explosion AND both sides of the
    // verify join — recomputing the regex shingling three times costs
    // more than materializing the arrays. localCheckpoint (not persist):
    // its blocks are context-cleaned once the frame is unreferenced,
    // where a persist() entry would pin the CacheManager until an
    // explicit unpersist no caller can safely issue on a lazy result.
    val sh = docs.select(col(idCol).as("_id"),
        shingles(col(textCol), shingleN).as("_sh"))
      .localCheckpoint(true)
    jaccardSelfJoinPre(sh, "_id", "_sh", threshold)
  }

  /** [[jaccardSelfJoin]] over PRE-SHINGLED documents: `pre` carries the id
    * and the shingle array (from [[shingles]]) and MUST already be
    * materialized (checkpointed/cached) by the caller — the arrays are
    * read by the gram explosion and both sides of the verify join, so an
    * unmaterialized input would re-run its lineage three times. Lets a
    * composed pipeline (q110: the same survivor frame feeds near-dup
    * clustering AND decontamination gram matching) shingle its corpus
    * exactly once instead of per consumer. */
  def jaccardSelfJoinPre(pre: DataFrame, idCol: String, shCol: String,
                         threshold: Double): DataFrame = {
    val sh = pre.select(col(idCol).as("_id"), col(shCol).as("_sh"))
    // Candidate generation runs on 8-byte GRAM IDS (xxhash64 of the
    // shingle), never the shingle text (round 18, guide §2.3 "shuffle
    // keys and metadata instead of payloads"): the df aggregation, the
    // prefix join-back and the candidate self-join shuffle a long per
    // gram instead of a ~20-60 B string — a ≥2× byte cut on this
    // operator's hottest exchanges. The prefix-filter theorem needs only
    // a global total order on grams, so (df, gram_id) orders as validly
    // as (df, gram text). A cross-doc hash collision can only ADD a
    // candidate pair, which the exact-Jaccard verify below discards; a
    // within-doc collision (probability ≤ |grams|²/2⁶⁵ ≈ 2⁻⁴⁵ for a
    // 1k-gram doc) could shrink that doc's effective prefix by one —
    // the standard collision-bound caveat of hashed set-similarity
    // joins, negligible against data corruption rates.
    val grams = sh.select(col("_id"), size(col("_sh")).as("_len"),
        explode(col("_sh")).as("_gram0"))
      .select(col("_id"), col("_len"), xxhash64(col("_gram0")).as("_gram"))
    val freq = grams.groupBy("_gram").agg(count(lit(1)).as("_df"))
    val prefix = grams.join(freq, "_gram")
      .withColumn("_rank", row_number().over(
        Window.partitionBy("_id").orderBy(col("_df"), col("_gram"))))
      .filter(col("_rank") <=
        floor(lit(1.0 - threshold) * col("_len")).cast("int") + 1)
      .select(col("_id"), col("_gram"))
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a._gram") === col("b._gram") &&
        col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    verifyWithShingles(cands, sh, threshold)
  }

  /** Verify candidate pairs against a precomputed `(_id, _sh)` frame. */
  private def verifyWithShingles(pairs: DataFrame, sh: DataFrame,
                                 threshold: Double): DataFrame = {
    // Scale path (guide §3.2): the two verify joins shuffle `sh` BY ID —
    // without a prefilter that ships the WHOLE corpus's shingle arrays
    // across the wire twice, though only docs that appear in a candidate
    // pair can contribute. Semi-join `sh` down to candidate ids behind a
    // broadcast first (candidates are sparse by the prefix filter's
    // design — the id set is ≤2·|pairs| longs, and the broadcast-build
    // job's shuffles are reused by the main join's stages). On the
    // small-input profile the corpus fits in a few exchanges anyway and
    // the extra broadcast build is its own scheduled job, so the
    // prefilter engages only at scale.
    val shc =
      if (graft.ExecProfile.isSmall(sh.sparkSession)) sh
      else {
        val ids = pairs.select(col("id_a").as("_id"))
          .union(pairs.select(col("id_b").as("_id"))).distinct()
        sh.join(broadcast(ids), Seq("_id"), "left_semi")
      }
    pairs
      .join(shc.select(col("_id").as("id_a"), col("_sh").as("sh_a")), "id_a")
      .join(shc.select(col("_id").as("id_b"), col("_sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
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

  /** Embedding-cosine near-duplicate pairs: all pairs above `threshold` —
    * the EXACT tier, quadratic in corpus size by problem statement; the
    * default at scale is [[embeddingNearDupBanded]], which bounds
    * candidates with banded sign-LSH and only loses recall below ρ≈0.7.
    *
    * Scale shape (the two things that make this survive a large corpus):
    *
    *  1. The pair join is forced to SHUFFLE_REPLICATE_NL — Spark's
    *     shuffle-based CartesianProduct. Each task streams one (blockA,
    *     blockB) partition pair, so the n² work is tiled across pA×pB
    *     balanced tasks and NOTHING is broadcast; the former plan
    *     (BroadcastNestedLoopJoin) shipped the whole corpus to every task
    *     and died at the first non-toy corpus.
    *  2. A 64-bit sign-LSH signature ([[Similarity.signBucket]]) is
    *     precomputed per row and pairs are pre-filtered on Hamming
    *     distance (2 instructions) before the O(dim) dot product.
    *
    * On the Hamming cutoff: a pair at cosine ρ disagrees per plane w.p.
    * arccos(ρ)/π, so h ~ Binomial(64, θ/π). At high thresholds the
    * prefilter prunes ~99% of candidate dots (ρ=0.9 → E[h]=9 vs 32 for
    * orthogonal pairs); near ρ=0.45 (θ≈63°) the separation from random
    * pairs is intrinsically small — `maxHamming=64` disables pruning and
    * is the exactness-guaranteed default. A bucketed sign-LSH equi-join
    * (band buckets instead of a pair scan) only wins when the threshold
    * is high enough that a band of planes agrees w.h.p.; for top-k ANN
    * use [[Similarity.lshTopK]]. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double, dim: Int = 64,
                       maxHamming: Int = 64,
                       maxExactRows: Long = 65536L): DataFrame = {
    graft.expressions.VectorExpressions.register(df.sparkSession)
    // This tier is DELIBERATELY all-pairs (a replicated-NL join) — the
    // only complete answer at low thresholds where sign-LSH bands can't
    // separate (scaladoc above). That makes it quadratic BY DESIGN, so
    // it REFUSES corpora where quadratic is the wrong tool instead of
    // silently burning a cluster: the same guarded-tier pattern as the
    // Graph/Rca resident tiers. The probe is a cheap limit-scan, not a
    // full count. Pass a larger maxExactRows to override deliberately.
    val probe = if (maxExactRows >= Int.MaxValue - 1L) Int.MaxValue
                else (maxExactRows + 1L).toInt
    val n = df.limit(probe).count()
    require(n <= maxExactRows,
      s"embeddingNearDup is the EXACT all-pairs tier (quadratic by " +
        s"design) and the corpus exceeds maxExactRows=$maxExactRows — " +
        s"use embeddingNearDupBanded (the scale path) or raise the cap " +
        s"explicitly")
    // per-row norms + signatures precomputed before the pair join
    // (1 dot per pair instead of 3; signature once per row, not per pair).
    // localCheckpoint materializes the slim (id, vec, norm, sig) frame in
    // the block manager BEFORE the replicated-NL tiling: each tile then
    // reads memory, not parquet — without it the tile join re-pays the
    // cold-scan cost once per tile (N× amplification when the hot tier
    // isn't resident). Bounded by construction: the maxExactRows guard
    // above caps this at ≤64k rows of (id, vec, 8B sig, 8B norm).
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      sqrt(Similarity.dotNative(col(vecCol), col(vecCol))).as("_n"),
      Similarity.signBucket(col(vecCol), dim, 64).as("_sig"))
      .localCheckpoint(true)
    val a = base.select(col("_id").as("id_a"), col("_v").as("_va"),
      col("_n").as("_na"), col("_sig").as("_siga"))
    val b = base.select(col("_id").as("id_b"), col("_v").as("_vb"),
      col("_n").as("_nb"), col("_sig").as("_sigb"))
    a.hint("shuffle_replicate_nl")
      .join(b, col("id_a") < col("id_b") &&
        bit_count(col("_siga").bitwiseXOR(col("_sigb"))) <= maxHamming)
      .withColumn("cos", Similarity.dotNative(col("_va"), col("_vb")) /
        (col("_na") * col("_nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Banded sign-LSH near-duplicate pairs — the SCALE path for embedding
    * near-dup (the default; [[embeddingNearDup]] is the exact small-corpus
    * tier).
    *
    * Candidate pairs are generated by a (band, signature) equi-join over
    * [[Similarity.signBands]] — a pair is a candidate iff ANY of the
    * `bands` r-bit sign bands matches, exactly the MinHash banding
    * construction of [[minhashCandidates]] — then verified with the exact
    * cosine. NO pair scan anywhere: candidate volume is bounded per
    * bucket (a random pair matches a given r-bit band w.p. 2^-r, so
    * expected candidates ≈ n²·bands/2^r instead of n²), and the join
    * shuffles 8-byte signatures + ids, never the vectors. Recall per true
    * pair at cosine ρ is 1 − (1 − p^r)^bands with p = 1 − arccos(ρ)/π —
    * near 1 for ρ ≥ 0.9 at 8×8, dropping fast below ρ ≈ 0.7: at low
    * thresholds exact all-pairs ([[embeddingNearDup]]) is the only
    * complete answer, by the geometry of random hyperplanes. */
  def embeddingNearDupBanded(df: DataFrame, vecCol: String, idCol: String,
                             threshold: Double, dim: Int = 64,
                             planes: Int = 64, bands: Int = 8): DataFrame = {
    graft.expressions.VectorExpressions.register(df.sparkSession)
    val withNorm = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      sqrt(Similarity.dotNative(col(vecCol), col(vecCol))).as("_n"))
    val banded = withNorm.select(col("_id"),
      posexplode(Similarity.signBands(col("_v"), dim, planes, bands))
        .as(Seq("_band", "_sig")))
    val cand = banded.as("a")
      .join(banded.as("b"), col("a._band") === col("b._band") &&
        col("a._sig") === col("b._sig") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    cand
      .join(withNorm.select(col("_id").as("id_a"), col("_v").as("_va"),
        col("_n").as("_na")), "id_a")
      .join(withNorm.select(col("_id").as("id_b"), col("_v").as("_vb"),
        col("_n").as("_nb")), "id_b")
      .withColumn("cos", Similarity.dotNative(col("_va"), col("_vb")) /
        (col("_na") * col("_nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Connected components over a near-duplicate pair list — the step that
    * turns pairwise matches (from [[jaccardSelfJoin]], [[minhashCandidates]],
    * [[embeddingNearDupBanded]]…) into dedup CLUSTERS: transitive closure,
    * each node labeled with the minimum id of its component.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond") — the published
    * O(log²n)-round bound with per-round work linear in the edge count:
    *  - large-star(u): link every neighbor v > u to m = min(Γ⁺(u));
    *  - small-star(u): link every neighbor v ≤ u (edges oriented
    *    larger→smaller) plus u itself to m = min(Γ≤(u) ∪ {u}).
    * Each round is two shuffles (groupBy min + equi-join back), carrying
    * only 8-byte id pairs — never document payloads. A naive label
    * propagation needs O(diameter) rounds; star-contraction collapses long
    * chains exponentially, which is what survives a 100 TB corpus whose
    * duplicate graph can have deep chains (A≈B≈C≈… transitive drift).
    * Lineage is truncated per round with an eager localCheckpoint (its
    * blocks free with the frame, unlike persist), so the plan doesn't grow
    * with the iteration count; the convergence check rides on the
    * checkpoint's own materialization.
    *
    * Returns one row per node appearing in `pairs`: (id, component) with
    * component = min id of the connected component. Ids must be orderable
    * (the component label is an id, per the algorithm's total order).
    * Singleton documents (no pair) don't appear — callers coalesce:
    * `docs.join(cc, docs(id)===cc(id), "left")` + `coalesce(component, id)`.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxRounds: Int = 50,
                          maxDriverEdges: Long = 2000000L): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    // large-star: from the symmetric view, m = min(Γ(u) ∪ {u}); emit
    // (v, m) for v > u. Strictly-larger neighbors hook onto the local min.
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val mins = s.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      s.join(mins, "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    // small-star: orient each edge larger→smaller, m = min(N(u) ∪ {u});
    // emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
      val linked = oriented.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = mins.select(col("u"), col("m").as("v"))
      linked.union(self).filter(col("u") =!= col("v")).distinct()
    }
    // The long cast below would silently null non-numeric ids (and the
    // u =!= v filter would then drop every edge → an empty result that
    // LOOKS like "no duplicates"). Fail loudly instead: only integral
    // id columns are accepted; hash string ids to long (xxhash64)
    // before calling.
    Seq(aCol, bCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = pairs.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"connectedComponents: id column '$c' is " +
          s"${pairs.schema(c).dataType}, not integral — hash string ids " +
          "to long (e.g. xxhash64) before calling")
    }
    var edges = pairs
      .select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // Two tiers, the GRAPH/RCA resident-tier pattern: a deduped edge
    // list within the guard collects once and resolves with a
    // path-compressed union-find on the driver (attach-larger-under-
    // smaller, so every root IS its component min — identical labels
    // to the contraction below); past the guard the O(log²n)
    // star-contraction rounds take over. 2M edges = 32 MB on the
    // driver — at that size a fixpoint of distributed 5-shuffle rounds
    // is pure scheduling overhead on ANY cluster, which is why
    // production CC implementations run exactly this hybrid (Kiveris
    // '14 §6 notes the small-graph cutoff too).
    // Tier decision WITHOUT a count() job (round 17): the eager
    // localCheckpoint above already materialized the edge blocks, so the
    // block manager knows their size — read it from storage info instead
    // of scheduling a count. The byte gate must never trigger a collect
    // that the row guard would then discard (round-18 hardening: disk-
    // resident blocks report compact SERIALIZED sizes, so a byte-small
    // frame can hold far more than maxDriverEdges rows — collecting it
    // just to drop it is the driver-heap blowup the guard exists to
    // prevent, and it happens exactly under the memory pressure that
    // spills blocks). So: collect ONLY when every block is memory-
    // resident (deserialized SizeEstimator sizes, ≥16 B per 2-long row)
    // AND the conservative row estimate bytes/16 clears maxDriverEdges;
    // anything byte-small but estimate-ambiguous takes the counted gate
    // (one cheap scan of the just-materialized blocks), so the path
    // choice stays row-exact. Missing storage info falls back to the
    // counted gate too.
    val memOnlyBytes: Option[Long] =
      try {
        val ids = edges.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
        }.toSet
        val infos = pairs.sparkSession.sparkContext.getRDDStorageInfo
          .filter(i => ids.contains(i.id))
        if (infos.isEmpty || infos.exists(_.diskSize > 0)) None
        else Some(infos.map(_.memSize).sum)
      } catch { case _: Exception => None }
    val collected: Option[Array[org.apache.spark.sql.Row]] =
      memOnlyBytes match {
        case Some(b) if b / 16 <= maxDriverEdges =>
          Some(edges.collect()).filter(_.length <= maxDriverEdges)
        case Some(b) if b > 192L * (1 << 20) =>
          None // structurally past the driver tier — skip even the count
        case _ =>
          if (edges.count() <= maxDriverEdges) Some(edges.collect())
          else None
      }
    if (collected.isDefined) {
      val arr = collected.get
      val parent = new java.util.HashMap[Long, java.lang.Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = Option(parent.get(x)).map(_.longValue).getOrElse(x)
        while (p != x) {
          val gp = Option(parent.get(p)).map(_.longValue).getOrElse(p)
          parent.put(x, gp); x = p; p = gp
        }
        x
      }
      var i = 0
      while (i < arr.length) {
        val ra = find(arr(i).getLong(0)); val rb = find(arr(i).getLong(1))
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
        i += 1
      }
      val seen = new java.util.HashSet[Long]()
      val out = Seq.newBuilder[(Long, Long)]
      arr.foreach { r =>
        Seq(r.getLong(0), r.getLong(1)).foreach { x =>
          if (seen.add(x)) out += ((x, find(x)))
        }
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return out.result().toDF("id", "component")
    }
    // fingerprint (count, order-free hash-sum) decides convergence — one
    // cheap scan over the just-materialized checkpoint blocks per round
    var fp = (-1L, Option.empty[String])
    var converged = false
    var round = 0
    // release a superseded round's localCheckpoint blocks EAGERLY: the
    // ContextCleaner only frees them after a GC notices the dropped
    // reference, so back-to-back executions (bench reps, a composed
    // curation pass) otherwise stack rounds × runs checkpoint copies
    // in the block manager (q105 measured 1.5 s → 3.0 s from exactly
    // this accumulation)
    def releaseCheckpoint(df: DataFrame): Unit =
      try df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))
      catch { case _: Exception => () }
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // decimal accumulation: exact and order-free, immune to ANSI
      // long-overflow on the summed 64-bit hashes
      val row = next.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      val nfp = (row.getLong(0),
        Option(row.get(1)).map(_.toString))
      converged = nfp == fp
      fp = nfp
      // `next` is materialized — the previous round's blocks are dead
      releaseCheckpoint(edges)
      edges = next
      round += 1
    }
    // converged star graphs: every node's min over Γ⁺ IS the component min
    sym(edges).groupBy("u").agg(least(min(col("v")), col("u")).as("component"))
      .select(col("u").as("id"), col("component"))
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64 (seed 42,
    * Spark's own), bitwise weighted vote per bit position — one pass via
    * the native [[graft.expressions.SimHash64]] expression (the prior
    * composable form ran 64 interpreted `aggregate` folds per row; the
    * native single pass is ~64× cheaper and bit-identical). NULL text
    * hashes to 0L, matching the old column-math null semantics. */
  def simhash(text: Column): Column = {
    graft.expressions.VectorExpressions.register(
      org.apache.spark.sql.SparkSession.active)
    coalesce(
      call_function("simhash64", split(lower(trim(text)), "\\s+")),
      lit(0L))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SemDeDup (Abbas et al. '23, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then mark as duplicates rows whose cosine to a
    * LOWER-ID member of the SAME cluster exceeds `tau` — all-pairs cosine
    * runs only WITHIN a cluster, which is the whole point of the
    * algorithm (LAION/DataComp curation runs this shape at billions of
    * vectors; the quadratic is bounded per cluster, k grows with the
    * corpus so cluster sizes stay ~n/k).
    *
    * The keep rule here is order-independent ("dup iff a τ-similar
    * smaller-id clustermate exists") rather than the paper's
    * sequential-scan variant, so the decision is exactly replayable by an
    * external checker given the assignments.
    *
    * Spark shape: one deterministic bounded-sample Lloyd train
    * ([[Similarity.ivfTrain]] — decimal means, bit-reproducible), a
    * codegen'd nearest-centroid assignment, one self-equi-join ON THE
    * CLUSTER ID (never a cross join — asserted in ScaleSpec), native
    * `vec_dot` cosine on the surviving pairs, and a left-semi mark. The
    * join shuffles (cluster, id, vec) once; at scale the vec payload is
    * the PQ-code variant's job, this is the exact tier. */
  def semDedup(corpus: DataFrame, vecCol: String, idCol: String,
               cents: Array[Seq[Double]], tau: Double): DataFrame = {
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    val assigned = corpus.select(col(idCol).as("vec_id"),
      col(vecCol).as("_v"),
      Similarity.nearestBucket(col(vecCol), cents).as("cluster"))
    // EXPLICIT fixed-N cluster partitioning for the pair join: its map
    // INPUT is small (id + vec per row) so AQE coalesces the exchange to
    // 1-2 reducers, but the join's OUTPUT is the within-cluster pair
    // stream — orders of magnitude larger and invisible to input-byte
    // coalescing (the honest ×100 sweep measured two 32-second tasks on
    // 30 idle cores). A user-specified partition count is exempt from
    // AQE coalescing, and the single exchange is shared by both sides
    // of the self-join.
    val parts = math.max(
      corpus.sparkSession.sparkContext.defaultParallelism,
      corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val slim = assigned.select(col("cluster"), col("vec_id"), col("_v"))
      .repartition(parts, col("cluster"))
    val dups = slim.as("i")
      .join(slim.as("j"), col("i.cluster") === col("j.cluster") &&
        col("j.vec_id") < col("i.vec_id"))
      .filter(Similarity.cosineNative(col("i._v"), col("j._v")) > tau)
      .select(col("i.vec_id").as("vec_id")).distinct()
    assigned
      .join(dups.withColumn("_dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("_dup"), lit(false)).as("is_dup"))
  }
}
