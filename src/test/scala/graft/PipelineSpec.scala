package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sampling, Similarity, TextAnalysis}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (4L, "completely different words about spark engines here today")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .orderBy("keep_id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L), (4L, 1L)))
  }

  test("shingles: n-gram windows, deduped") {
    val sh = docs.filter($"doc_id" === 1)
      .select(Dedup.shingles($"text", 3).as("sh"))
      .as[Seq[String]].collect().head
    assert(sh.contains("the quick brown"))
    assert(sh.contains("over the lazy"))
    assert(sh.length == 7) // 9 tokens → 7 trigrams, all distinct
  }

  test("minhash LSH surfaces near-duplicate pair") {
    val cand = Dedup.minhashCandidates(docs, "text", "doc_id",
        shingleN = 2, k = 16, bands = 8)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 3L))) // exact dup always collides
    assert(cand.contains((1L, 2L)) || cand.contains((2L, 3L))) // near-dup
    assert(!cand.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard verification scores candidate pairs exactly") {
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerify(pairs, docs, "text", "doc_id",
        shingleN = 3, threshold = 0.0)
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect()
    assert(out(0) == ((1L, 3L, 1.0)))   // identical text
    assert(out(1)._3 == 0.0)            // disjoint shingles
  }

  test("bm25: the literal-map query path equals the qTerms-frame path " +
      "(the round-18 q122 collect-to-literal rewrite)") {
    import graft.pipeline.Retrieval
    val real = Tables.table(spark, sf, "documents").select("doc_id", "text")
    val qTerms = real.filter($"doc_id" < 4)
      .select($"doc_id".as("query_id"),
        explode(split(lower(trim($"text")), "\\s+")).as("term"))
      .distinct()
    val viaFrame = Retrieval.bm25TopKTerms(real.filter($"doc_id" >= 4),
        "text", "doc_id", qTerms, k = 10)
      .as[(Long, Long, Int, Double)].collect().toSet
    val qTexts = real.filter($"doc_id" < 4)
      .select($"doc_id", array_join(array_distinct(
        split(lower(trim($"text")), "\\s+")), " ").as("qtext"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val viaLiteral = Retrieval.bm25TopK(real.filter($"doc_id" >= 4),
        "text", "doc_id", qTexts, k = 10)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaLiteral == viaFrame)
  }

  test("prefix-filter jaccard self-join equals the all-pairs scan") {
    val real = Tables.table(spark, sf, "documents").select("doc_id", "text")
    val fast = Dedup.jaccardSelfJoin(real, "text", "doc_id",
        shingleN = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val ids = real.select($"doc_id")
    val pairs = ids.select($"doc_id".as("id_a"))
      .join(ids.select($"doc_id".as("id_b")), $"id_a" < $"id_b")
    val brute = Dedup.jaccardVerify(pairs, real, "text", "doc_id",
        shingleN = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast.nonEmpty, "corpus has near-dups at 0.8 — none found")
    assert(fast == brute)
  }

  test("simhash: identical texts hash equal, hamming 0") {
    val h = docs.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(3L))
    val d12 = java.lang.Long.bitCount(h(1L) ^ h(2L))
    val d14 = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(d12 < d14) // near-dup closer than unrelated doc
  }

  test("token counting: whitespace and BPE-ish") {
    val r = Seq(("ab cd, ef 12x!", 1L)).toDF("text", "id")
      .select(TextAnalysis.tokenCount($"text").as("ws"),
        TextAnalysis.bpeishTokenCount($"text").as("bpe"))
      .as[(Long, Long)].collect().head
    assert(r._1 == 4L)  // ab | cd, | ef | 12x!
    assert(r._2 == 7L)  // ab cd , ef 12 x !
  }

  test("quality features") {
    val f = Seq(("the cat sat", 1L)).toDF("text", "id")
      .select(TextAnalysis.qualityFeatures($"text").as("f"))
      .select("f.n_tokens", "f.stopword_ratio", "f.punct_ratio")
      .as[(Long, Double, Double)].collect().head
    assert(f._1 == 3L)
    assert(f._2 == 1.0 / 3.0)
    assert(f._3 == 0.0)
  }

  test("langId picks the language with most marker hits") {
    val r = Seq(("el gato y la casa para los amigos", 1L), // es markers
        ("the house and the dog with this cat", 2L))       // en markers
      .toDF("text", "id")
      .select($"id", TextAnalysis.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "es")
    assert(r(2L) == "en")
  }

  test("chunking: overlapping token windows, short docs get one chunk") {
    val doc = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Seq((1L, doc), (2L, "tiny doc")).toDF("doc_id", "text")
      .select($"doc_id", explode(TextAnalysis.chunk($"text", 40, 10)).as("c"))
      .select($"doc_id", $"c.chunk_idx", $"c.chunk_text")
      .as[(Long, Int, String)].collect()
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.length == 3) // ceil((100-10)/30) = 3
    assert(doc1(0)._3.startsWith("w1 ") && doc1(1)._3.startsWith("w31 "))
    // 10-token overlap: chunk0 ends at w40, chunk1 starts at w31
    assert(doc1(0)._3.endsWith(" w40"))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("tiny doc"))
  }

  test("PII redaction replaces emails, IPs, digit runs") {
    val r = Seq(("mail a@b.com ip 10.0.0.1 card 1234567890 ok", 1L))
      .toDF("text", "id")
      .select(TextAnalysis.redactPii($"text")).as[String].collect().head
    assert(r == "mail [EMAIL] ip [IP] card [NUM] ok")
  }

  test("quality gate keeps long stopword-bearing text, drops junk") {
    val good = ("the quick brown fox and the dog " * 5).trim
    val junk = "!!! ??? ###"
    val out = Seq((1L, good), (2L, junk)).toDF("id", "text")
      .select($"id", TextAnalysis.qualityKeep(
        TextAnalysis.qualityFeatures($"text")).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L))
  }

  test("hash sampling: deterministic, proportional, stratified") {
    import graft.pipeline.Sampling
    val ids = (1L to 10000L).toDF("id")
      .withColumn("grp", (col("id") % 2 === 0).cast("string"))
    val s1 = Sampling.sampleByHash(ids, "id", 0.3)
    val s2 = Sampling.sampleByHash(ids, "id", 0.3)
    assert(s1.count() == s2.count())                      // reproducible
    assert(math.abs(s1.count() - 3000L) < 300)            // ~fraction
    // smaller fraction is a subset of larger (nested by construction)
    val s3 = Sampling.sampleByHash(ids, "id", 0.1)
    assert(s3.join(s1, "id", "left_anti").count() == 0)
    val strat = Sampling.stratifiedSample(ids, "grp", "id",
      Map("true" -> 0.5, "false" -> 0.1))
    val byGrp = strat.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byGrp("true") - 2500L) < 300)
    assert(math.abs(byGrp("false") - 500L) < 150)
  }

  test("fingerprint: equal texts collide, different texts don't") {
    val fp = docs.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(4L))
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("native vec_dot is bit-identical to the composable fold") {
    graft.expressions.VectorExpressions.register(spark)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(Similarity.dot($"a.embedding", $"b.embedding").as("fold"),
        Similarity.dotNative($"a.embedding", $"b.embedding").as("native"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (f, n) => f == n })
  }

  test("vec_nearest_centroid rejects null codebooks at analysis time") {
    graft.expressions.VectorExpressions.register(spark)
    // a null codebook literal / a codebook with a null row must fail with
    // a message naming the function, not NPE at first row evaluation
    val e1 = intercept[Exception] {
      vecs.select(org.apache.spark.sql.functions.call_function(
        "vec_nearest_centroid", $"embedding",
        org.apache.spark.sql.functions.lit(null)
          .cast("array<array<double>>"))).collect()
    }
    assert(e1.getMessage.contains("vec_nearest_centroid"))
    val e2 = intercept[Exception] {
      vecs.select(org.apache.spark.sql.functions.call_function(
        "vec_nearest_centroid", $"embedding",
        org.apache.spark.sql.functions.typedlit(
          Seq(Seq(1.0, 0.0, 0.0), null)))).collect()
    }
    assert(e2.getMessage.contains("vec_nearest_centroid"))
  }

  test("bruteForceTopK ranks by cosine") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
        "embedding", "vec_id", 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("lshTopK returns correctly-ranked subset of true neighbors") {
    val out = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0),
        "embedding", "vec_id", dim = 3, planes = 2, k = 3)
      .orderBy("rank").select("neighbor_id", "cos").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("lshTopK recall vs brute force on the driver embeddings") {
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = topSet(Similarity.bruteForceTopK(emb, queries,
      "embedding", "vec_id", 5))
    val approx = topSet(Similarity.lshTopK(emb, queries,
      "embedding", "vec_id", dim = 64, planes = 2, k = 5))
    assert(approx.nonEmpty)
    // recall floor is modest by design — these embeddings' nearest
    // neighbors sit at cos≈0.5 (63°), where even one sign plane agrees
    // only w.p. ~0.65 per neighbor; 2 planes ⇒ expected recall ~0.42
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall $recall")
  }

  test("sampleN: deterministic, uniform-ish, exact size") {
    val docs = Tables.table(spark, sf, "documents")
    val a = Sampling.sampleN(docs, "doc_id", 50, seed = 7)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.sampleN(docs, "doc_id", 50, seed = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 50)
    val other = Sampling.sampleN(docs, "doc_id", 50, seed = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(a != other) // a different seed draws a different subset
  }

  test("ivfTopK: probing every cell reproduces exact brute force; fewer " +
      "probes trade recall; codebook is run-stable") {
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val cents = Similarity.ivfTrain(emb, "embedding", "vec_id", k = 8,
      iters = 2)
    val cents2 = Similarity.ivfTrain(emb, "embedding", "vec_id", k = 8,
      iters = 2)
    assert(cents.map(_.toList).toSeq == cents2.map(_.toList).toSeq)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = topSet(Similarity.bruteForceTopK(emb, queries,
      "embedding", "vec_id", 5))
    val all = topSet(Similarity.ivfTopK(emb, queries, "embedding",
      "vec_id", cents, nprobe = 8, k = 5))
    assert(all == exact, "nprobe = #cells must equal brute force")
    val few = topSet(Similarity.ivfTopK(emb, queries, "embedding",
      "vec_id", cents, nprobe = 2, k = 5))
    val recall = (few & exact).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall $recall")
  }

  test("pqTrain single-pass multi-subspace Lloyd is bit-identical to the " +
      "per-subspace ivfTrain composition it replaced; model cache hits " +
      "return the trained artifact without retraining") {
    val emb = Tables.table(spark, sf, "embeddings")
    val dim = 64; val m = 8; val sub = dim / m
    val onePass = Similarity.pqTrain(emb, "embedding", "vec_id", dim = dim,
      m = m, ksub = 16, iters = 2)
    // the pre-round-10 shape: m sequential ivfTrain calls on slices
    val perSubspace = (0 until m).toArray.map { i =>
      Similarity.ivfTrain(
        emb.select($"vec_id", slice($"embedding", i * sub + 1, sub).as("_sub")),
        "_sub", "vec_id", k = 16, iters = 2)
    }
    assert(onePass.map(_.map(_.toList).toList).toSeq ==
      perSubspace.map(_.map(_.toList).toList).toSeq)
    // cache: second retrieval under the same key must be the same object
    // and must not invoke the trainer again
    var trains = 0
    def trainOnce() = { trains += 1; onePass }
    val k1 = Similarity.cachedModel("spec:pq:fixture")(trainOnce())
    val k2 = Similarity.cachedModel("spec:pq:fixture")(trainOnce())
    assert(trains == 1 && (k1 eq k2))
  }

  test("ivfPqTopK: full probe + exhaustive refine reproduces brute force; " +
      "default params keep high recall; codes are m small ints") {
    val emb = Tables.table(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val cents = Similarity.ivfTrain(emb, "embedding", "vec_id", k = 8,
      iters = 2)
    val cbs = Similarity.pqTrain(emb, "embedding", "vec_id", dim = 64,
      m = 8, ksub = 16, iters = 2)
    // deterministic training: same inputs → byte-identical codebooks
    val cbs2 = Similarity.pqTrain(emb, "embedding", "vec_id", dim = 64,
      m = 8, ksub = 16, iters = 2)
    assert(cbs.map(_.map(_.toList).toList).toSeq ==
      cbs2.map(_.map(_.toList).toList).toSeq)
    // codes: m entries, each within [0, ksub)
    val codes = emb.select(
        Similarity.pqEncode($"embedding", cbs, 64).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = topSet(Similarity.bruteForceTopK(emb, queries,
      "embedding", "vec_id", 5))
    val n = emb.count().toInt
    // probe every cell AND keep the whole candidate set through refine →
    // the exact-cosine re-rank IS brute force
    val full = topSet(Similarity.ivfPqTopK(emb, queries, "embedding",
      "vec_id", cents, cbs, dim = 64, nprobe = 8, k = 5, refine = n))
    assert(full == exact, "nprobe=#cells + exhaustive refine must equal brute force")
    // production-ish params: ADC shortlist + re-rank holds most of top-k
    val approx = topSet(Similarity.ivfPqTopK(emb, queries, "embedding",
      "vec_id", cents, cbs, dim = 64, nprobe = 4, k = 5, refine = 4))
    val recall = (approx & exact).size.toDouble / exact.size
    // deterministic (seeded centroids, decimal means): measured 0.475 on
    // this near-orthogonal random fixture — the hostile regime for ADC;
    // the floor just guards against regressions, not a quality claim
    assert(recall >= 0.45, s"ivf-pq recall $recall")
  }

  test("pq_adc native expression is bit-identical to the composable " +
      "element_at lambda fold on valid codes; out-of-range yields NULL") {
    graft.expressions.VectorExpressions.register(spark)
    val rnd = new scala.util.Random(11)
    val m = 16; val ksub = 32
    val rows = (0 until 500).map { i =>
      val codes = Seq.fill(m)(rnd.nextInt(ksub))
      val tables = Seq.fill(m)(Seq.fill(ksub)(rnd.nextDouble() * 10 - 5))
      (i, codes, tables)
    }
    val df = rows.toDF("id", "codes", "tables")
    val got = df.select($"id",
        call_function("pq_adc", $"codes", $"tables").as("s"))
      .as[(Int, Option[Double])].collect().toMap
    val want = df.select($"id",
        aggregate(zip_with($"codes", $"tables",
            (c, t) => element_at(t, c + 1)),
          lit(0.0), (acc, v) => acc + v).as("s"))
      .as[(Int, Option[Double])].collect().toMap
    assert(got == want) // exact Double equality: same sequential fold
    // defensive divergence from ANSI element_at (which would FAIL the
    // query): a malformed code drops the candidate via NULL instead
    val bad = Seq((7, Seq(0, 99) ++ Seq.fill(m - 2)(0),
        Seq.fill(m)(Seq.fill(ksub)(1.0))))
      .toDF("id", "codes", "tables")
      .select(call_function("pq_adc", $"codes", $"tables").as("s"))
      .as[Option[Double]].collect()
    assert(bad.sameElements(Array(None)), "out-of-range code must yield NULL")
  }

  test("IVF codebook is a single matrix literal: O(1) expression nodes " +
      "and correct assignment at k=256") {
    // 256 deterministic 64-dim centroids — production-scale cell count
    graft.expressions.VectorExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val cents: Array[Seq[Double]] =
      Array.fill(256)(Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    val assign = Similarity.nearestBucket($"embedding", cents)
    // the design ceiling the round-3 verdict flagged: per-centroid l2sq
    // columns put k × dim literal payloads in the tree (~65k nodes at
    // k=256); the matrix-literal form must stay O(1) nodes regardless of k
    def nodes(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      1 + e.children.map(nodes).sum
    val emb = Tables.table(spark, sf, "embeddings").limit(50)
    val treeSize = emb.select(assign.as("bkt")).queryExecution.analyzed
      .expressions.map(nodes).sum
    assert(treeSize < 100,
      s"expression tree must not scale with k: $treeSize nodes")
    val got = emb.select($"vec_id", assign.as("bkt"))
      .as[(Long, Int)].collect().toMap
    // driver-side oracle: argmin over squared L2, ties to lowest index
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    vecs.foreach { case (id, v) =>
      val best = cents.indices.minBy { i =>
        val c = cents(i)
        var s = 0.0; var d = 0
        while (d < 64) { val t = v(d).toDouble - c(d); s += t * t; d += 1 }
        s
      }
      assert(got(id) == best, s"vec $id: got ${got(id)} want $best")
    }
    // the whole assignment stays inside whole-stage codegen: the project
    // carries the `*(n)` codegen-stage marker (a CodegenFallback
    // expression — e.g. any higher-order-function form — would strip it)
    val plan = emb.select(assign.as("bkt")).queryExecution.executedPlan
      .toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      plan.linesIterator.take(5).mkString("\n"))
  }

  test("embeddingNearDup: Hamming-prefiltered result equals the exact " +
      "(unpruned) pair set on the driver embeddings") {
    val emb = Tables.table(spark, sf, "embeddings")
    def pairs(maxH: Int) =
      Dedup.embeddingNearDup(emb, "embedding", "vec_id", threshold = 0.45,
          maxHamming = maxH)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairs(64)
    assert(exact.nonEmpty)
    assert(pairs(42) == exact,
      "h<=42 prefilter must not drop any qualifying pair at this sf")
  }

  test("embeddingNearDupBanded: subset of the exact tier with identical " +
      "cosines; full recall on planted high-cosine near-dups") {
    val emb = Tables.table(spark, sf, "embeddings")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val exact = toMap(Dedup.embeddingNearDup(emb, "embedding", "vec_id",
      threshold = 0.45))
    val banded = toMap(Dedup.embeddingNearDupBanded(emb, "embedding",
      "vec_id", threshold = 0.45))
    assert(banded.keySet.subsetOf(exact.keySet),
      "banded candidates that verify must be true pairs")
    banded.foreach { case (k, c) =>
      assert(c == exact(k), s"$k cosine mismatch: banded $c vs exact ${exact(k)}")
    }

    // planted near-dups: 80 seeded unit-ish vectors + a ρ≈0.97 perturbed
    // copy of each — the regime banding is FOR. Recall must be total here
    // (per-pair detect prob at ρ=0.97 with 8×8 bands is ~0.998).
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = (0 until 80).map(i => (i.toLong, vec()))
    val planted = base.map { case (i, v) =>
      (i + 1000L, v.map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val truePairs = toMap(Dedup.embeddingNearDup(df, "embedding", "vec_id",
      threshold = 0.9)).keySet
    assert(truePairs.size >= 70, s"planting failed: ${truePairs.size} pairs")
    val found = toMap(Dedup.embeddingNearDupBanded(df, "embedding", "vec_id",
      threshold = 0.9)).keySet
    val recall = (found & truePairs).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"planted-dup recall $recall")
  }

  test("connected components: chains, separate components, min labels") {
    // component {1..5} as a chain (diameter 4 — exercises the contraction,
    // not just one hop), component {10,11}, pair list order irrelevant
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(cc == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: self-pairs and duplicates collapse; empty in, empty out") {
    val pairs = Seq((7L, 7L), (8L, 9L), (9L, 8L), (8L, 9L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // 7 only appears in a self-pair → no edge → absent (a singleton)
    assert(cc == Seq(8L -> 8L, 9L -> 8L))
    val empty = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(empty.count() == 0)
  }

  test("connected components on a random graph equal a driver-side union-find") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map(_ => (rnd.nextInt(120).toLong,
      rnd.nextInt(120).toLong)).filter(p => p._1 != p._2)
    val cc = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(cc == want)
    // the distributed star-contraction tier (guard forced to 0) labels
    // the same graph identically — both tiers stay pinned
    val ccDist = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(ccDist == want)
  }

  test("keep-best dedup: cluster representative is max tokens, min id tiebreak") {
    val d = Seq(
      (1L, "one two three four"),          // 4 tokens
      (2L, "one two three four five"),     // 5 tokens — keep
      (3L, "one two three four five"),     // 5 tokens, higher id
      (9L, "lonely standalone document")   // singleton
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .select($"id".as("doc_id"), $"component")
    val best = d.join(cc, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"component", $"doc_id").as("cluster"),
        TextAnalysis.tokenCount($"text").as("n_tokens"))
      .groupBy("cluster")
      .agg(min(struct((-$"n_tokens").as("neg"), $"doc_id".as("id")))
        .getField("id").as("keep_id"))
      .orderBy("cluster").as[(Long, Long)].collect().toSeq
    assert(best == Seq(1L -> 2L, 9L -> 9L))
  }

  test("repetition signals: dup-word and top-bigram fractions") {
    val d = Seq(
      (1L, "a a a a"),              // all dup words; bigram "a a" ×3 of 3
      (2L, "w x y z"),              // no repetition; each bigram once of 3
      (3L, "one"),                  // single token: no bigrams → 0.0
      (4L, "go go stop go go stop") // "go go" 2× of 5 bigrams
    ).toDF("doc_id", "text")
    val toks = split(trim($"text"), "\\s+")
    val bg = slice(zip_with(toks, slice(toks, lit(2), size(toks)),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), greatest(size(toks) - 1, lit(0)))
    val maxRun = aggregate(array_sort(bg),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val out = d.select($"doc_id",
        (lit(1.0) - size(array_distinct(toks)) / size(toks).cast("double"))
          .as("dupw"),
        when(size(bg) > 0, maxRun.cast("double") / size(bg))
          .otherwise(lit(0.0)).as("topbg"))
      .orderBy("doc_id").as[(Long, Double, Double)].collect()
    assert(out(0) == ((1L, 0.75, 1.0)))
    assert(out(1) == ((2L, 0.0, 1.0 / 3)))
    assert(out(2) == ((3L, 0.0, 0.0)))
    assert(out(3) == ((4L, 1.0 - 2.0 / 6, 2.0 / 5)))
  }

  test("bigramLmBuckets: hand-computed add-one bigram weights and " +
      "head/middle/tail split") {
    // corpus: c12 = {(a,b):3, (b,a):1, (c,c):2}; c1 = {a:3, b:1, c:2};
    // V = |{a,b,c}| = 3 → w(a,b)=round(1e6·4/6)=666667,
    // w(b,a)=round(1e6·2/4)=500000, w(c,c)=round(1e6·3/5)=600000
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c c c"),
      (4L, "solo")).toDF("doc_id", "text")
    val out = graft.pipeline.Selection.bigramLmBuckets(d, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect()
    // doc 4 has a single token — no bigrams, excluded
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0) == ((1L, 3L, 2L * 666667 + 500000, 2)))
    assert(out(1) == ((2L, 1L, 666667L, 1))) // avg 666667 → head
    assert(out(2) == ((3L, 2L, 1200000L, 3))) // avg 600000 → tail
  }

  test("BPE: hand-worked merges (low/lower), early stop, tie-break, " +
      "unseen-word fallback") {
    import graft.pipeline.Bpe
    // freqs {low:2, lower:1}: r1 counts (l,o)=3 (o,w)=3 (w,</w>)=2 … —
    // tie at 3 → lexicographically smallest (l,o); then (lo,w)=3; then
    // (low,</w>)=2; then every pair is a singleton → early stop at 3
    val (merges, segs) = Bpe.trainOnFreqs(
      Seq("low" -> 2L, "lower" -> 1L), nMerges = 10)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "low" -> "</w>"))
    assert(segs("low") == Vector("low</w>"))
    assert(segs("lower") == Vector("low", "e", "r", "</w>"))
    val d = Seq((1L, "low low lower"), (2L, "new")).toDF("doc_id", "text")
    val out = Bpe.segmentCounts(d, "text", "doc_id", segs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(out(0) == ((1L, 3L, 1L + 1L + 4L)))
    assert(out(1) == ((2L, 1L, 4L))) // unseen: |chars| + terminal
  }

  test("leakageSafeSplit: clusters stay whole, counts and naive-leak " +
      "replicate the hash rule exactly") {
    import graft.pipeline.Sampling
    val texts = Seq("aa", "aa", "bb", "cc", "cc", "cc", "dd", "ee",
      "ee", "ff")
    val d = texts.zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t) }.toDF("doc_id", "text")
    def hb(x: Long): Long =
      math.floorMod(math.floorMod(x, 2147483647L) * 2654435761L,
        2147483647L)
    def splitOf(x: Long): String =
      if (hb(x) < Sampling.SplitT1) "train"
      else if (hb(x) < Sampling.SplitT2) "val" else "test"
    // pure-scala replication of the whole operator
    val byText = texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
      .groupBy(_._2).values.map(g => (g.map(_._1).min, g.map(_._1)))
    val want = byText.groupBy { case (rep, _) => splitOf(rep) }
      .map { case (sp, cl) =>
        (sp, cl.map(_._2.size).sum.toLong, cl.size.toLong,
          cl.count(_._2.map(splitOf).distinct.size > 1).toLong) }
      .toSeq.sortBy(_._1)
    val got = Sampling.leakageSafeSplit(d, "text", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want, s"$got vs $want")
    assert(got.map(_._2).sum == 10 && got.map(_._3).sum == 6)
  }

  test("mmrRerank: diversity pass demotes the redundant near-duplicate " +
      "of an already-selected result") {
    // q=(1,.1). Candidates: a=(1,0) cos .9950; b=(.999,-.02) cos .9929
    // (a near-dup of a: sim(b,a)=.9998); c=(.7,.7) cos .7740. Pure
    // relevance ranks a,b,c — MMR at λ=0.5 after picking a scores
    // b at .5(.9929-.9998)=-.0035 vs c at .5(.7740-.7071)=+.0334,
    // so the diverse c displaces the redundant b.
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.999f, -0.02f)),
      (12L, Seq(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val q = Seq((1L, Seq(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val out = graft.pipeline.Similarity.mmrRerank(corpus, q, "embedding",
        "vec_id", kCand = 3, kOut = 3, lambda = 0.5)
      .orderBy("rank")
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(10L, 12L, 11L), out.toString)
    // pure relevance keeps the redundant doc second: λ=1 degenerates
    // to the cosine order
    val rel = graft.pipeline.Similarity.mmrRerank(corpus, q, "embedding",
        "vec_id", kCand = 3, kOut = 3, lambda = 1.0)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(rel == Seq(10L, 11L, 12L), rel.toString)
  }

  test("linearProbe: solver exact on a known system; probe separates " +
      "the labeled slice on a toy corpus") {
    import graft.pipeline.Selection
    // 2x + y = 3, x + 3y = 5 → x = 4/5, y = 7/5
    val x = Selection.solveInPlace(
      Array(Array(2.0, 1.0), Array(1.0, 3.0)), Array(3.0, 5.0))
    assert(math.abs(x(0) - 0.8) < 1e-12 && math.abs(x(1) - 1.4) < 1e-12)
    val d = Seq(
      (1L, "alpha beta alpha", "en"), (2L, "alpha beta beta", "en"),
      (3L, "gamma delta gamma", "fr"), (4L, "delta gamma delta", "fr"),
      (5L, "alpha beta gamma", "en"), (6L, "gamma delta beta", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = graft.pipeline.Selection
      .linearProbe(d, "text", "doc_id", $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(out.forall(_._2 == 3)) // n_tok excludes the intercept
    val en = out.filter(_._3 == 1).map(_._4.toDouble)
    val fr = out.filter(_._3 == 0).map(_._4.toDouble)
    assert(en.sum / en.size > fr.sum / fr.size,
      s"en ${en.toSeq} vs fr ${fr.toSeq}")
  }

  test("CorpusWriter: token-budgeted shards roundtrip, manifest " +
      "verifies, corruption detected") {
    import graft.pipeline.CorpusWriter
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val man = CorpusWriter
      .writeShards(d, "text", "doc_id", dir, tokensPerShard = 4000)
      .collect()
    assert(man.length > 1, s"expected >1 shard, got ${man.length}")
    // every document lands in exactly one shard
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == d.count())
    assert(back.select("doc_id").distinct().count() == d.count())
    // manifest totals = corpus totals; self-verification is clean
    assert(man.map(_.getLong(1)).sum == d.count())
    assert(CorpusWriter.verifyShards(spark, dir, "text", "doc_id")
      .count() == 0)
    // hash balance: no shard above 2x the mean token mass
    val toks = man.map(_.getLong(2))
    assert(toks.max <= 2 * (toks.sum / toks.length),
      toks.mkString(","))
    // corrupt one shard file -> exactly that shard flagged
    val f = java.nio.file.Files.walk(
        java.nio.file.Paths.get(dir, "data", "shard=0"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.delete(f)
    val bad = CorpusWriter.verifyShards(spark, dir, "text", "doc_id")
      .select("shard").as[Long].collect().toSeq
    assert(bad == Seq(0L), bad.toString)
  }

  test("embeddingNearDup (exact tier) refuses corpora above its " +
      "quadratic-safe cap") {
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.embeddingNearDup(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding", "vec_id", threshold = 0.9, maxExactRows = 3L)
    }
    assert(e.getMessage.contains("embeddingNearDupBanded"), e.getMessage)
    // the documented escape hatch survives a cap >= Int.MaxValue:
    // the probe clamps instead of overflowing to a negative limit
    val ok = graft.pipeline.Dedup.embeddingNearDup(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(4),
      "embedding", "vec_id", threshold = 0.99,
      maxExactRows = Long.MaxValue)
    assert(ok.count() >= 0L)
  }

  test("CorpusWriter: above maxManifestRows the manifest goes " +
      "distributed (shards_file pointer, no driver collect) and still " +
      "verifies") {
    import graft.pipeline.CorpusWriter
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_big").toString
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // clamp boundary: force more shards than the inline cap
    val man = CorpusWriter.writeShards(d, "text", "doc_id", dir,
      tokensPerShard = 4000, maxManifestRows = 2)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    assert(json.contains("\"shards_file\":\"manifest_shards\"") &&
      !json.contains("\"shards\":["), json.take(200))
    val nShards = man.count()
    assert(nShards > 2, nShards.toString)
    // pointer manifest rows match the returned frame and the data
    val ptr = spark.read.json(s"$dir/manifest_shards")
    assert(ptr.count() == nShards)
    assert(CorpusWriter.verifyShards(spark, dir, "text", "doc_id")
      .count() == 0)
    // inline path at EXACTLY the cap still inlines
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_shards_edge").toString
    val man2 = CorpusWriter.writeShards(d, "text", "doc_id", dir2,
      tokensPerShard = 4000, maxManifestRows = nShards.toInt)
    val json2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, "manifest.json")), "UTF-8")
    assert(json2.contains("\"shards\":[") && !json2.contains("shards_file"))
    assert(man2.count() == nShards)
  }
}
