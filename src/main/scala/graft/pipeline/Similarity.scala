package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - `bruteForceTopK` is the exact baseline: broadcast the (small) query
  *    set, evaluate cosine per (query, candidate) with codegen'd
  *    `zip_with`/`aggregate` column math, rank per query. The corpus side
  *    streams — no shuffle of the corpus, only of the top-k partials.
  *  - `lshTopK` is the scale path: random-hyperplane (sign) LSH buckets
  *    both sides; candidates are joined per bucket so the cross product is
  *    bounded per bucket instead of |Q|×|C|.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double —
    * composable reference form (zip_with + fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Native-codegen dot (graft.expressions.VectorDot): same sequential sum,
    * no intermediate arrays — requires VectorExpressions.register(spark),
    * which the top-k entry points call. */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native dot kernel (bit-identical to [[cosine]]). */
  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))


  /** Per-query top-k by `score`, via the bounded-heap aggregate
    * ([[graft.expressions.TopKRows]]): map-side partials keep ≤k
    * candidates per query per task, so the shuffle after the candidate
    * join carries O(k·|Q|·partitions) rows — a window rank would move
    * EVERY scored (query, candidate) pair into one partition per query,
    * the worst plan shape a |Q|×|corpus| fan-out can pick. Emits
    * (payload columns of `df`) + 1-based `rank`. */
  private def topKPerQuery(df: DataFrame, k: Int, score: Column,
                           scoreDesc: Boolean): DataFrame = {
    graft.expressions.TopKRows.register(df.sparkSession)
    val payload = df.columns.toSeq
    val st = struct(Seq(score.as("_tk_s0"),
      col("neighbor_id").as("_tk_s1")) ++ payload.map(col): _*)
    val mask = (if (scoreDesc) "D" else "A") + "A"
    df.groupBy(col("query_id"))
      .agg(call_function("topk_rows", st, lit(k), lit(2), lit(mask))
        .as("_tk_top"))
      .select(posexplode(col("_tk_top")).as(Seq("_tk_pos", "_tk_row")))
      .select(payload.map(c => col(s"_tk_row.$c").as(c)) :+
        (col("_tk_pos") + 1).cast("int").as("rank"): _*)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); `corpus` can be
    * arbitrarily large — the join is a broadcast nested loop producing
    * |Q| rows per corpus row, immediately reduced by the per-query rank. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int): DataFrame = {
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    // norms are per-row, so compute them BEFORE the pair join — the join
    // fan-out then reuses them (1 dot per pair instead of 3)
    // maybeBroadcast: the tiny query side broadcasts at scale; under the
    // small-input profile the broadcast build would be its own scheduled
    // job, so the pair join runs as an in-job cartesian there instead.
    // coalesce(1): the query side is small by contract, and a cartesian's
    // task count is |corpus parts| × |query parts| — a handful of query
    // rows scattered over cache partitions would multiply empty tasks.
    val q = graft.ExecProfile.maybeBroadcast(
      queries.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_qn"))
        .coalesce(1))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("_cv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_cn"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotNative(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    topKPerQuery(scored.select("query_id", "neighbor_id", "cos"), k,
        col("cos"), scoreDesc = true)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** splitmix64 finalizer — the ±1 hyperplane weights derive from it so
    * they are reproducible outside Spark (test oracles, margin math). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Plane `p`'s ±1 hyperplane weights — splitmix64-derived constants, so
    * test oracles (and the DuckDB gate SQL) can rebuild them verbatim. */
  private[graft] def planeWeights(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d =>
      if ((mix64(d * 7919L + p * 104729L) & 1L) == 0L) 1.0 else -1.0)

  /** Sign projection of `vec` onto plane `p` (one zip_with+fold pass). */
  private def planeProj(vec: Column, p: Int, dim: Int): Column =
    aggregate(
      zip_with(vec, typedlit(planeWeights(p, dim)),
        (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-LSH bucket id: `planes` fixed pseudo-random ±1 hyperplanes —
    * deterministic, no data needed to "train".
    *
    * Each plane's weights are a driver-side constant ARRAY literal and the
    * projection is one `zip_with`+`aggregate` pass — the expression tree is
    * O(planes) nodes with tight per-row loops, not the O(planes×dim)
    * unrolled tree a per-dimension element_at sum builds (20k expression
    * nodes blow past codegen method limits and fall back to per-node
    * interpretation — measured 13× slower on the near-dup bench). */
  def signBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      when(planeProj(vec, p, dim) >= 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Banded sign-LSH signatures: `planes` hyperplanes split into `bands`
    * groups of planes/bands bits each; element b is band b's bit pattern.
    * Two vectors are near-dup CANDIDATES when ANY full band matches — the
    * multi-band OR construction (same shape as MinHash banding): per-band
    * match probability is p^r for per-plane agreement p = 1 − θ/π, so
    * narrow bands (small r) raise recall and wide bands cut candidate
    * volume (a random pair matches a given r-bit band w.p. 2^-r). */
  def signBands(vec: Column, dim: Int, planes: Int, bands: Int): Column = {
    require(planes % bands == 0, s"bands $bands must divide planes $planes")
    val r = planes / bands
    array((0 until bands).map { b =>
      (0 until r).map { j =>
        when(planeProj(vec, b * r + j, dim) >= 0, shiftleft(lit(1L), j))
          .otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y))
    }: _*)
  }

  /** `array<struct<d, i>>` of (squared L2 distance to centroid i, i) for
    * the WHOLE codebook — the codebook is ONE k×dim matrix literal
    * consumed by one `transform` lambda, so the expression tree is O(1)
    * nodes no matter how many cells: per-centroid `l2sq` columns
    * (k × dim-literal payloads) blow past codegen/analysis limits around
    * k≈256, the same ceiling signBucket's docstring documents for
    * unrolled trees. Struct order (d, then i) makes min/sort tie-break on
    * the lower index. */
  private def distIdx(vec: Column, cents: Array[Seq[Double]]): Column =
    transform(typedlit(cents.toSeq), (c, i) =>
      struct(
        aggregate(zip_with(vec, c,
            (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
          lit(0.0), (acc, v) => acc + v).as("d"),
        i.as("i")))

  /** Train an IVF codebook: k seed vectors chosen by hash rank
    * (deterministic, no RNG) + `iters` Lloyd refinements whose per-bucket
    * means go through DECIMAL sums, so the codebook is bit-reproducible
    * run to run. The codebook is k×dim doubles — a model artifact that
    * lives on the driver and broadcasts into the assignment expression;
    * each refinement is one distributed pass (explode dims → per-bucket
    * per-dim mean), nothing per-row ever collects. */
  /** Deterministic bounded training sample — FAISS trains its coarse and
    * product quantizers on a ~64k subsample regardless of corpus size
    * (clustering quality saturates; the full pass only costs). Hash-mod
    * filter on the id column: exact passthrough when the corpus is
    * already within the bound, so small-corpus training (and every
    * cached model keyed on it) stays bit-identical to the unbounded
    * form. With the bound, TRAIN cost is O(sample) however large the
    * corpus — only encode ([[ivfPqIndex]]) scales with the data.
    * Measured before the bound (AnnSweep buildrate): pqTrain 78 s at
    * 200k and 725 s at 2M — linear in the corpus, the anti-scale shape. */
  val defaultTrainSample = 65536
  private def trainSlice(corpus: DataFrame, idCol: String,
                         bound: Int): DataFrame = {
    val n = corpus.count()
    if (n <= bound) corpus
    else corpus.filter(
      pmod(xxhash64(col(idCol)), lit((n + bound - 1) / bound)) === 0)
  }

  def ivfTrain(corpus: DataFrame, vecCol: String, idCol: String,
               k: Int, iters: Int = 2,
               trainSample: Int = defaultTrainSample): Array[Seq[Double]] = {
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    val train = trainSlice(corpus, idCol, trainSample)
    var cents: Array[Seq[Double]] = train
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    val dim = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      val assigned = train.select(col(vecCol).as("_v"),
        nearestBucket(col(vecCol), cents).as("_b"))
      // per-bucket per-dim means as `dim` aggregate columns in ONE pass:
      // partial sums combine map-side and only k×dim decimals cross the
      // shuffle (the previous posexplode shape shuffled rows×dim values).
      // DECIMAL sums keep the means order-independent, and double/count
      // is the same IEEE division the exploded form performed.
      val meanCols = (0 until dim).map(d =>
        (sum(element_at(col("_v"), d + 1).cast("decimal(28,10)"))
          .cast("double") / count(lit(1))).as(s"_m$d"))
      val byBucket = assigned.groupBy(col("_b"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> r).toMap
      val next = cents.zipWithIndex.map { case (old, b) =>
        byBucket.get(b) match {
          case Some(r) => (0 until dim).map(d => r.getDouble(d + 1))
          case None => old // empty cell keeps its centroid
        }
      }
      cents = next
    }
    cents
  }

  /** Index of the nearest centroid (ties → lowest index) — the native
    * codegen'd expression ([[graft.expressions.NearestCentroid]]): O(1)
    * tree nodes and a fused primitive loop for any cell count. Requires
    * `VectorExpressions.register(spark)` (the IVF entry points call it).
    * Bit-identical to the composable [[distIdx]]+array_min form. */
  def nearestBucket(vec: Column, cents: Array[Seq[Double]]): Column =
    call_function("vec_nearest_centroid", vec, typedlit(cents.toSeq))

  /** IVF ANN: corpus rows partition into `cents.length` coarse cells;
    * each query probes its `nprobe` nearest cells and ranks candidates
    * exactly. Candidate volume ≈ nprobe/k of the corpus — the classic
    * inverted-file trade: recall grows with nprobe, nprobe = k degrades
    * to exact brute force. The probe join is a bucket equi-join, so the
    * corpus shuffles once by cell and never broadcasts. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, cents: Array[Seq[Double]], nprobe: Int,
              k: Int): DataFrame = {
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("_cn"),
      nearestBucket(col(vecCol), cents).as("_bkt"))
    // a query's probe list: its nprobe nearest cells (sorted (dist, idx)
    // pairs — struct order breaks ties on the index); same single-matrix
    // codebook literal as the assignment side.
    // maybeBroadcast (round 18, here and in ivfPqProbe/lshTopK): the tiny
    // query side broadcasts at scale (the corpus side never moves), but
    // under the small-input profile the broadcast build is its own
    // scheduled job — a pure job floor on a probe joining a few MB — so
    // the small path takes the in-job shuffle (all these probe joins are
    // bucket equi-joins, never nested loops).
    val qd = distIdx(col(vecCol), cents)
    val qb = graft.ExecProfile.maybeBroadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_qn"),
        slice(array_sort(qd), 1, nprobe).as("_probes"))
      .select(col("query_id"), col("_qv"), col("_qn"),
        explode(col("_probes.i")).as("_bkt")))
    val scored = cb.join(qb, Seq("_bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotNative(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    topKPerQuery(scored.select("query_id", "neighbor_id", "cos"), k,
        col("cos"), scoreDesc = true)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Product-quantization codebooks: the vector is split into `m`
    * subspaces of dim/m dims; each subspace gets its own `ksub`-centroid
    * codebook trained by the same deterministic Lloyd as [[ivfTrain]].
    * Result: `m` codebooks of ksub×(dim/m) doubles — a driver-side model
    * artifact like the IVF codebook (Jégou/Douze/Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search").
    *
    * ALL m subspaces train in each distributed pass: 1 seed collect (the
    * per-subspace hash-rank seed order is the idCol order, identical
    * across subspaces, so one collect of the full vectors seeds every
    * codebook) + `iters` passes that explode each row into its m
    * (subspace, assignment, slice) tuples and aggregate every
    * (subspace, bucket) mean at once. The per-subspace-sequential shape
    * (m × (1 + iters) driver-blocking actions — 64 scheduled jobs at
    * m=16/iters=3) paid ~0.5 s of scheduling per action on a corpus that
    * needs milliseconds of arithmetic; bit-identical output, since the
    * (subspace, bucket) groups hold exactly the rows the per-subspace
    * groupBy held and the DECIMAL sums are order-independent. */
  def pqTrain(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
              m: Int, ksub: Int, iters: Int = 2,
              trainSample: Int = defaultTrainSample)
      : Array[Array[Seq[Double]]] = {
    require(dim % m == 0, s"m $m must divide dim $dim")
    val sub = dim / m
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    val train = trainSlice(corpus, idCol, trainSample)
    val seedRows = train
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(ksub)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    var books: Array[Array[Seq[Double]]] = (0 until m).toArray.map(i =>
      seedRows.map(v => v.slice(i * sub, (i + 1) * sub): Seq[Double]))
    for (_ <- 0 until iters) {
      val exploded = train.select(explode(array((0 until m).map { i =>
          val sl = slice(col(vecCol), i * sub + 1, sub)
          struct(lit(i).as("_i"), nearestBucket(sl, books(i)).as("_b"),
            sl.as("_v"))
        }: _*)).as("_e"))
        .select(col("_e._i").as("_i"), col("_e._b").as("_b"),
          col("_e._v").as("_v"))
      val meanCols = (0 until sub).map(d =>
        (sum(element_at(col("_v"), d + 1).cast("decimal(28,10)"))
          .cast("double") / count(lit(1))).as(s"_m$d"))
      val byKey = exploded.groupBy(col("_i"), col("_b"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      books = books.zipWithIndex.map { case (book, i) =>
        book.zipWithIndex.map { case (old, b) =>
          byKey.get((i, b)) match {
            case Some(r) => (0 until sub).map(d => r.getDouble(d + 2))
            case None => old // empty cell keeps its centroid
          }
        }
      }
    }
    books
  }

  /** Fingerprint-keyed cache for deterministic trained models (IVF
    * centroids, PQ codebooks). The deployment shape trains ONCE at write
    * time and probes many times (the FAISS IVFADC model [[ivfPqIndex]]
    * exists for); a repeated query over unchanged data re-deriving the
    * codebooks is the in-process analogue of re-building an index per
    * read. Key with the source file fingerprint (Tables.fingerprint —
    * name+mtime+size, same staleness rule as the hot tier) plus every
    * training parameter; both trainers are bit-reproducible (hash-rank
    * seeds, DECIMAL means), so a hit returns exactly what retraining
    * would. Values are k×dim double matrices — a few KB each; the cap
    * just bounds a pathological many-dataset session. */
  private val modelMemo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  def cachedModel[T <: AnyRef](key: String)(train: => T): T = {
    if (modelMemo.size > 256) modelMemo.clear()
    modelMemo.computeIfAbsent(key, _ => train).asInstanceOf[T]
  }

  /** PQ code array for a vector: element i = index of subspace i's nearest
    * sub-centroid. The whole corpus compresses to m small ints per row —
    * at m=8 that is 8 codes for a 64-float vector, a 32× smaller scoring
    * index. Same O(1)-node native kernel per subspace. */
  def pqEncode(vec: Column, codebooks: Array[Array[Seq[Double]]],
               dim: Int): Column = {
    val m = codebooks.length; val sub = dim / m
    array((0 until m).map(i =>
      nearestBucket(slice(vec, i * sub + 1, sub), codebooks(i))): _*)
  }

  /** IVF-PQ ANN with asymmetric-distance scoring and exact re-rank — the
    * standard billion-scale index shape (FAISS "IVFADC+R"):
    *
    *  1. corpus rows carry (id, coarse cell, m PQ codes) — candidate
    *     SCORING never touches the raw vectors, so the shuffled index side
    *     is ~m bytes/row instead of dim floats (the property that makes
    *     100 TB of embeddings probe-able);
    *  2. each query broadcasts its nprobe coarse cells plus its ADC
    *     tables — per subspace, the ksub squared-L2 distances from the
    *     query's slice to that subspace's codebook (an O(ksub·dim) column
    *     expression per query row, computed once before the join);
    *  3. approx distance per candidate = Σ_m table[m][code[m]] — a pure
    *     lookup fold, no vector math in the join;
    *  4. the `refine`·k best candidates per query by approx distance are
    *     joined BACK to the corpus vectors for exact-cosine re-ranking —
    *     one narrow equi-join on ids that touches refine·k·|Q| rows.
    *
    * Recall is governed by nprobe (coarse tier) × refine (ADC tier);
    * refine ≥ corpus/k degrades to exact search within probed cells. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                idCol: String, cents: Array[Seq[Double]],
                codebooks: Array[Array[Seq[Double]]], dim: Int,
                nprobe: Int, k: Int, refine: Int = 4): DataFrame = {
    // index built inline — a deployment builds it ONCE at write time via
    // [[ivfPqIndex]] and probes the stored frame with [[ivfPqProbe]]
    val idx = ivfPqIndex(corpus, vecCol, idCol, cents, codebooks, dim)
    ivfPqProbe(idx, corpus, queries, vecCol, idCol, cents, codebooks, dim,
      nprobe, k, refine)
  }

  /** The stored half of the IVF-PQ index: (neighbor_id, coarse cell,
    * m PQ codes) — ~m bytes of codes per row. At write time this frame is
    * persisted (partitioned by `_bkt`); probes then never touch the raw
    * vectors until the exact re-rank of the shortlist. */
  def ivfPqIndex(corpus: DataFrame, vecCol: String, idCol: String,
                 cents: Array[Seq[Double]],
                 codebooks: Array[Array[Seq[Double]]], dim: Int): DataFrame = {
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("neighbor_id"),
      nearestBucket(col(vecCol), cents).as("_bkt"),
      pqEncode(col(vecCol), codebooks, dim).as("_codes"))
  }

  /** Probe a prebuilt [[ivfPqIndex]] frame: broadcast each query's nprobe
    * coarse cells + ADC tables, score candidates with the native `pq_adc`
    * lookup fold (the composable element_at lambda form is
    * CodegenFallback — it dropped the scoring projection out of
    * whole-stage codegen exactly on the O(candidates) path), then re-rank
    * the refine·k shortlist exactly against `vectors` (the raw-vector
    * table; only refine·k·|Q| rows of it are touched, via an id
    * equi-join). */
  def ivfPqProbe(idx: DataFrame, vectors: DataFrame, queries: DataFrame,
                 vecCol: String, idCol: String, cents: Array[Seq[Double]],
                 codebooks: Array[Array[Seq[Double]]], dim: Int,
                 nprobe: Int, k: Int, refine: Int = 4): DataFrame = {
    graft.expressions.VectorExpressions.register(idx.sparkSession)
    val m = codebooks.length; val sub = dim / m
    // query side: probes + ADC tables, broadcast
    def adcTable(i: Int) =
      transform(typedlit(codebooks(i).toSeq), c =>
        aggregate(zip_with(slice(col(vecCol), i * sub + 1, sub), c,
            (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
          lit(0.0), (acc, v) => acc + v))
    val qb = graft.ExecProfile.maybeBroadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_qn"),
        array((0 until m).map(adcTable): _*).as("_tables"),
        slice(array_sort(distIdx(col(vecCol), cents)), 1, nprobe)
          .as("_probes"))
      .select(col("query_id"), col("_qv"), col("_qn"), col("_tables"),
        explode(col("_probes.i")).as("_bkt")))
    val scored = idx.join(qb, Seq("_bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("_adc", call_function("pq_adc", col("_codes"),
        col("_tables")))
    val short = topKPerQuery(
        scored.select("query_id", "_qv", "_qn", "neighbor_id", "_adc"),
        k * refine, col("_adc"), scoreDesc = false)
      .select("query_id", "_qv", "_qn", "neighbor_id")
    // exact re-rank of the shortlist only
    val vecs = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("_cn"))
    val rescored = short.join(vecs, "neighbor_id")
      .withColumn("cos",
        dotNative(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    topKPerQuery(rescored.select("query_id", "neighbor_id", "cos"), k,
        col("cos"), scoreDesc = true)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** LSH-bucketed ANN: join queries and corpus on sign buckets, rank
    * within candidates. Recall < 1 by construction.
    *
    * `bands = 1` is classic single-table LSH: one 2^planes-bucket code,
    * candidates = same-bucket. `bands > 1` is the multi-table (banded)
    * construction — `planes` hyperplanes split into `bands` groups of
    * r = planes/bands bits; a candidate matches on ANY band (same OR-of-
    * ANDs shape as MinHash banding), so recall for a pair at angle θ is
    * 1 − (1 − p^r)^bands with p = 1 − θ/π, tunable without touching the
    * candidate-volume bound: a random pair collides a given band w.p.
    * 2^-r, so per-query candidates stay ≤ bands · |corpus| / 2^r in
    * expectation. Scale shape is unchanged — bucket equi-join on 8-byte
    * (band, pattern) keys, never a pair enumeration; the distinct
    * candidate set is re-scored against the corpus by id (one bounded
    * shuffle). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, dim: Int, planes: Int, k: Int,
              bands: Int = 1): DataFrame = {
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    val qPrepped = graft.ExecProfile.maybeBroadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("_qn")))
    if (bands <= 1) {
      val cb = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("_cv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_cn"),
        signBucket(col(vecCol), dim, planes).as("_bkt"))
      val qb = graft.ExecProfile.maybeBroadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_qn"),
        signBucket(col(vecCol), dim, planes).as("_bkt")))
      val scored = cb.join(qb, Seq("_bkt"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos",
          dotNative(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      return topKPerQuery(scored.select("query_id", "neighbor_id", "cos"),
          k, col("cos"), scoreDesc = true)
        .select("query_id", "neighbor_id", "rank", "cos")
    }
    val cBands = corpus.select(col(idCol).as("neighbor_id"),
        posexplode(signBands(col(vecCol), dim, planes, bands))
          .as(Seq("_band", "_pat")))
    val qBands = graft.ExecProfile.maybeBroadcast(queries.select(col(idCol).as("query_id"),
        posexplode(signBands(col(vecCol), dim, planes, bands))
          .as(Seq("_band", "_pat"))))
    val cand = cBands.join(qBands, Seq("_band", "_pat"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("_cv"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("_cn")), "neighbor_id")
      .join(qPrepped, "query_id")
      .withColumn("cos",
        dotNative(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    topKPerQuery(scored.select("query_id", "neighbor_id", "cos"), k,
        col("cos"), scoreDesc = true)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98):
    * from each query's top-`kCand` cosine candidates, greedily select
    * `kOut` maximizing `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — the
    * standard diversity pass RAG retrievers run after dense top-k.
    *
    * Distribution shape: the candidate frame is k-bounded per query
    * (ANN/brute-force top-k upstream), so the greedy loop runs inside
    * `flatMapGroups` with ≤kCand vectors per group — kCand² dot
    * products per QUERY, never per corpus; memory is O(kCand·dim).
    * Scales with query count, not corpus size.
    *
    * Determinism contract (replayed by tools/oracle.py): doc-doc
    * cosine is a sequential non-FMA f64 multiply-accumulate; greedy
    * ties break on smaller doc_id; candidates enter ordered by
    * (cos desc, doc_id asc).
    *
    * @return (query_id, doc_id, rank, relevance, mmr) — rank is the
    *         selection order, `mmr` the score at selection time
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, vecCol: String,
                idCol: String, kCand: Int, kOut: Int,
                lambda: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = bruteForceTopK(corpus, queries, vecCol, idCol, kCand)
    val ds = cands
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("_v")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("_v"))
      .as[(Long, Long, Double, Seq[Float])]
    ds.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val cand = it.toArray.sortBy(t => (-t._3, t._2))
      val vecs = cand.map(_._4.toArray.map(_.toDouble))
      val norms = vecs.map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
      def cosAt(a: Int, b: Int): Double = {
        val va = vecs(a); val vb = vecs(b)
        var s = 0.0; var i = 0
        while (i < va.length) { s += va(i) * vb(i); i += 1 }
        s / (norms(a) * norms(b))
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int, Double, Double)]
      var exhausted = false
      while (!exhausted && selected.length < math.min(kOut, cand.length)) {
        var bestIdx = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < cand.length) {
          if (!selected.contains(i)) {
            // true max over S — no 0 floor: doc-doc cosines can be
            // negative, and flooring would erase the diversity BONUS
            // an anti-correlated candidate earns
            var maxSim = Double.NegativeInfinity
            selected.foreach { s =>
              val c = cosAt(i, s); if (c > maxSim) maxSim = c
            }
            val score =
              if (selected.isEmpty) cand(i)._3
              else lambda * cand(i)._3 - (1 - lambda) * maxSim
            // strict > with (cos desc, id asc) entry order = ties to
            // the higher-relevance then smaller-id candidate
            if (score > bestScore) { bestScore = score; bestIdx = i }
          }
          i += 1
        }
        // every remaining score NaN (zero-norm vectors make cos 0/0):
        // stop emitting rather than index with -1 — degenerate
        // candidates rank nowhere instead of failing the task
        if (bestIdx < 0) exhausted = true
        else {
          selected += bestIdx
          out += ((qid, cand(bestIdx)._2, selected.length,
            cand(bestIdx)._3, bestScore))
        }
      }
      out.iterator
    }.toDF("query_id", "doc_id", "rank", "relevance", "mmr")
  }
}
