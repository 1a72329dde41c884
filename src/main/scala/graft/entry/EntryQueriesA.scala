package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GeminiFunctions, PromFunctions}
import graft.operators.{Fill, Meta, PromBinOp, PromRange, SeriesOps, Smoothing, Unnest, WindowedAgg}
import graft.pipeline.{AnomalyDetect, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** SparkEntry query inventory, first half (SURVEY §2.2–§2.7 relational /
  * series operators and the text-pipeline basics). Mechanical split of
  * SparkEntry.scala — entry bodies unchanged. */
trait EntryQueriesA extends EntryBase {
  protected def rawQueriesA: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.4 stream/hash agg: GROUP BY + {sum, avg, count} (TPC-H Q1 shape).
    "q01_agg_basic" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n_rows"))
        // ≤9 (flag × status) rows: single-partition total order skips
        // the range-sort sampling job (EntryBase.sorted1)
        .transform(sorted1(_, "l_returnflag", "l_linestatus"))
    }),

    // §2.2 filter/project + §2.6 global sort/limit; filters push to parquet.
    "q02_filter_sort_limit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("charge"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)
    }),

    // §2.3 joins: fact-fact shuffle join + broadcast dims (nation/region).
    "q03_join_revenue" -> ((s, dir) => {
      // Aggregate lineitem BY ORDERKEY below the join (round 12): the
      // revenue sum is per-(region, nation), so per-order partial sums
      // are exact intermediates (DECIMAL sums are associative) and the
      // join-key exchange carries ~1 row per order instead of ~4 line
      // items — the classic eager-aggregation pushdown, worth exactly
      // its fan-in at 100 TB (lineitem never crosses the wire raw).
      val liAgg = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)").as("_rev"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("_rev")).as("_rev0"), count(lit(1)).as("_n0"))
      // shuffle-hash hint: the date filter (pushed into the orders scan)
      // keeps ~1/7 of orders, so the hash build is small per partition
      // while a sort-merge join would sort the FULL lineitem side —
      // O(n log n) wasted on the big fact (the ×100 scaling run measured
      // it: 13.4 s, of which the lineitem sort dominated)
      val ord = t(s, dir, "orders").hint("shuffle_hash")
      val cust = t(s, dir, "customer")
      // nation⋈region pre-joined INSIDE one broadcast subtree: a 25×5-row
      // dim join costs nothing, and one broadcast exchange (= one build
      // job, one executor-side relation) replaces two — the same shape a
      // snowflake dim hierarchy should take at any scale. The broadcast
      // follows the profile (round 17): on the small path the build is
      // its own scheduled job — a full extra floor for a 25-row dim —
      // while an in-job 25-row shuffle join costs microseconds; at scale
      // the hint stays.
      val dims = graft.ExecProfile.maybeBroadcast(t(s, dir, "nation")
        .join(t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey")))
      liAgg.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(dims, col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("_rev0")).cast("double").as("revenue"),
          sum(col("_n0")).as("n_items"))
        .transform(sorted1(_, "r_name", "n_name")) // ≤25 (region×nation) rows
    }),

    // §2.3 IN-subquery → left-semi join (reference in_transform.go).
    "q04_semi_join" -> ((s, dir) => {
      // shuffle-hash: the quantity filter keeps ~2% of lineitem, so the
      // semi-join's build side is small per partition while a sort-merge
      // would sort the full orders side (q03's lesson at ×100)
      val hot = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_orderkey")).hint("shuffle_hash")
      t(s, dir, "orders")
        .join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .transform(sorted1(_, "o_orderstatus")) // 3 status rows
    }),

    // §2.3 NOT IN → left-anti join.
    "q05_anti_join" -> ((s, dir) => {
      // shuffle-hash: hash the orders keys instead of sorting 15M rows
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey"))
            .hint("shuffle_hash"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))
        .transform(sorted1(_, "c_mktsegment")) // 5 segment rows
    }),

    // §2.7 UNION + distinct (reference union sort-append + Distinct()).
    "q06_union_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .transform(sorted1(_, "nationkey")) // ≤25 nation rows
    }),

    // §2.4 top(f,n) selector per group via the bounded-heap aggregate.
    "q07_topk_per_group" -> ((s, dir) => {
      SeriesOps.topPerSeries(t(s, dir, "orders"), "o_totalprice",
          "o_orderkey", Seq("o_orderpriority"), 3)
        .withColumnRenamed("rank_in_series", "rnk")
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"))
        // 3×|groups| rows — single-partition sort, no range exchange
        .coalesce(1)
        .orderBy("o_orderpriority", "rnk")
    }),

    // §2.4 selectors first/last (min_by/max_by) + spread + §2.5 rate.
    "q08_selectors_rate" -> ((s, dir) => {
      val fl = SeriesOps.firstLast(t(s, dir, "events"), "value", "ts",
        Seq("event_type"))
      fl.withColumn("rate", (col("last") - col("first")) /
          ((col("last_t_us") - col("first_t_us")).cast("double") / 1e6))
        .transform(sorted1(_, "event_type")) // ≤5 tag rows
    }),

    // §2.4 GROUP BY tags, time(1h) — the core openGemini query shape.
    "q09_time_bucket" -> ((s, dir) => {
      WindowedAgg.timeBucket(t(s, dir, "events"), "ts", "1 hour",
          Seq("event_type"),
          Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
            davg(col("value")).as("avg_value")))
        .select("event_type", "wstart_ms", "n", "sum_value", "avg_value")
        .transform(sorted1(_, "event_type", "wstart_ms")) // spine-bounded
    }),

    // §2.5 difference().
    "q10_difference" -> ((s, dir) => {
      SeriesOps.difference(t(s, dir, "events"), "value", "ts", Seq("user_id"),
          nonNegative = false, tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("value"), col("difference"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // §2.5 derivative(f, 1s).
    "q11_derivative" -> ((s, dir) => {
      SeriesOps.derivative(t(s, dir, "events"), "value", "ts", Seq("user_id"),
          unitSeconds = 1.0, tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("derivative"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // §2.5 moving_average(f, 5) — full windows only.
    "q12_moving_average" -> ((s, dir) => {
      SeriesOps.movingAverage(t(s, dir, "events"), "value", "ts",
          Seq("user_id"), 5, tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("moving_average"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // §2.5 cumulative_sum.
    "q13_cumulative_sum" -> ((s, dir) => {
      SeriesOps.cumulativeSum(t(s, dir, "events"), "value", "ts",
          Seq("user_id"), tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("cumulative_sum"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // §2.5 integral (trapezoid) per series.
    "q14_integral" -> ((s, dir) => {
      SeriesOps.integral(t(s, dir, "events"), "value", "ts", Seq("user_id"),
          unitSeconds = 1.0, tieBreak = Seq("event_id"))
        .transform(sortedBounded(_, "user_id"))
    }),

    // §2.5 sliding_window: 2h windows sliding by 1h.
    "q15_sliding_window" -> ((s, dir) => {
      WindowedAgg.slidingWindow(t(s, dir, "events"), "ts", "2 hours", "1 hour",
          Seq("event_type"),
          Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
        .select("event_type", "wstart_ms", "n", "sum_value")
        .transform(sorted1(_, "event_type", "wstart_ms")) // spine-bounded
    }),

    // §2.6 per-series LIMIT (first 3 points per series).
    "q16_per_series_limit" -> ((s, dir) => {
      SeriesOps.limitPerSeries(t(s, dir, "events"), "ts", Seq("user_id"), 3,
          tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("value"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // fill(previous): dense hourly spine + LOCF per series.
    "q17_fill_previous" -> ((s, dir) => {
      val agg = WindowedAgg.timeBucket(t(s, dir, "events"), "ts", "1 hour",
        Seq("event_type"), Seq(davg(col("value")).as("avg_value")))
        .select("event_type", "wstart_ms", "avg_value")
      Fill.fillPrevious(agg, Seq("avg_value"), Seq("event_type"),
          EvStartMs, EvEndMs, HourMs)
        .select("event_type", "wstart_ms", "avg_value")
        .transform(sorted1(_, "event_type", "wstart_ms")) // spine-bounded
    }),

    // fill(linear): interpolate interior gaps, null edges.
    "q18_fill_linear" -> ((s, dir) => {
      val agg = WindowedAgg.timeBucket(t(s, dir, "events"), "ts", "1 hour",
        Seq("event_type"), Seq(davg(col("value")).as("avg_value")))
        .select("event_type", "wstart_ms", "avg_value")
      Fill.fillLinear(agg, "avg_value", Seq("event_type"),
          EvStartMs, EvEndMs, HourMs)
        .select("event_type", "wstart_ms", "avg_value")
        .transform(sorted1(_, "event_type", "wstart_ms")) // spine-bounded
    }),

    // §2.7 CTE + join + global top-k.
    "q19_cte_top_customers" -> ((s, dir) => {
      val rev = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
      rev.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // §2.8 conditional (CASE WHEN) aggregation (TPC-H Q14 shape).
    "q20_conditional_agg" -> ((s, dir) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, dir, "lineitem")
        // profile-following dim broadcast (round 18, the q03 rule): hint
        // at scale, plain join under the small profile where the
        // broadcast build is its own scheduled job
        .join(graft.ExecProfile.maybeBroadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6)
            .as("promo_revenue"),
          dsum(rev, 6).as("total_revenue"), count(lit(1)).as("n_items"))
        .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))
        .transform(sorted1(_, "ship_year")) // ≤7 year rows
    }),

    // §2.4 percentile (exact) + spread + stddev.
    "q21_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          (max(col("l_quantity")) - min(col("l_quantity"))).as("spread"),
          round(stddev(col("l_quantity")), 6).as("stddev_qty"))
        .transform(sorted1(_, "l_returnflag")) // 3 flag rows
    }),

    // §2.8 scalar string functions.
    "q22_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_name"), 1, 12).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          expr("replace(p_brand, 'Brand#', 'B')").as("brand_short"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"))
        .transform(sortedBounded(_, "p_partkey"))
    }),

    // pipeline: exact dedup (hash-grouped, shuffles 8-byte keys).
    "q23_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .select(col("keep_id"), col("dup_count"))
        .transform(sortedBounded(_, "keep_id"))
    }),

    // pipeline: text quality features aggregated per language.
    "q24_text_quality" -> ((s, dir) => {
      val f = TextAnalysis.qualityFeatures(col("text"))
      t(s, dir, "documents").select(col("lang"), f.as("f"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f.n_tokens")).as("sum_tokens"),
          dsum(col("f.mean_word_len"), 8).as("sum_mwl"),
          dsum(col("f.punct_ratio"), 8).as("sum_punct"),
          dsum(col("f.stopword_ratio"), 8).as("sum_stop"))
        .transform(sorted1(_, "lang")) // ≤5 lang rows
    }),

    // pipeline: BPE-ish + whitespace token counting per source.
    "q25_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(col("source"),
          TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe"),
          TextAnalysis.tokenCount(col("text")).as("n_ws"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("sum_bpe"),
          sum(col("n_ws")).as("sum_ws"))
        .transform(sorted1(_, "source")) // ≤5 source rows
    }),

    // pipeline: language-ID heuristic (argmax of marker-word scores) vs the
    // labeled lang column — emitted as a confusion count matrix.
    "q26_lang_id" -> ((s, dir) => {
      val scored = TextAnalysis.langScores(col("text"))
      val arr = array(scored.map { case (l, sc) =>
        struct(sc.as("score"), lit(l).as("plang")) }: _*)
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("plang").asc)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(arr).as("sc"))
        .select(col("doc_id"), col("lang"),
          col("sc.score").as("score"), col("sc.plang").as("plang"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("lang"), col("plang").as("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .transform(sorted1(_, "lang", "predicted")) // ≤25 confusion cells
    }),

    // pipeline: exact ANN baseline — brute-force cosine top-5 for 8 queries.
    "q27_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
          "embedding", "vec_id", 5)
        .withColumn("cos", round(col("cos"), 6))
        .transform(sorted1(_, "query_id", "rank")) // 40 k-bounded rows
    }),

    // pipeline: MinHash+LSH near-dup candidate pairs (no SQL oracle —
    // hash-permutation specific; verified by unit tests instead).
    "q28_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashCandidates(t(s, dir, "documents"), "text", "doc_id",
          shingleN = 3, k = 16, bands = 8)
        .transform(sortedBounded(_, "id_a", "id_b"))
    }),

    // pipeline: 64-bit SimHash fingerprint per document (no SQL oracle).
    "q29_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash64"))
        .transform(sortedBounded(_, "doc_id"))
    }),

    // §2.6 SLIMIT: first 3 series by tag order.
    "q30_slimit" -> ((s, dir) => {
      SeriesOps.slimit(t(s, dir, "events"), Seq("event_type"), 3)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .transform(sorted1(_, "event_type")) // ≤3 series rows
    }),

    // §2.4 distinct / count(distinct).
    "q31_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .transform(sorted1(_, "l_returnflag")) // 3 flag rows
    }),

    // §2.4 mode: most frequent value, deterministic tie-break (smallest).
    "q32_mode" -> ((s, dir) => {
      val counted = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("cnt").as("mode_n"))
        .transform(sorted1(_, "l_returnflag")) // 3 flag rows
    }),

    // §2.3 FULL OUTER join on tag columns.
    "q33_full_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val p = t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .transform(sorted1(_, "nationkey")) // ≤25 nation rows
    }),

    // §2.8 JSON extraction from the events props column.
    "q34_json_extract" -> ((s, dir) => {
      val k = nullif(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1), lit(""))
        .cast("long")
      t(s, dir, "events").select(col("event_type"), k.as("k_val"))
        .groupBy(col("event_type"))
        .agg(count(col("k_val")).as("n"), sum(col("k_val")).as("sum_k"),
          max(col("k_val")).as("max_k"))
        .transform(sorted1(_, "event_type")) // ≤5 tag rows
    }),

    // §2.10 UNNEST(match_all(regex)) — per-row capture-group extraction.
    "q35_unnest_regex" -> ((s, dir) => {
      Unnest.matchAll(t(s, dir, "documents"), "text",
          "^(\\w+) (\\w+)", Seq("w1", "w2"))
        .groupBy(col("w1")).agg(count(lit(1)).as("n"),
          countDistinct(col("w2")).as("n_w2"))
        .transform(sortedBounded(_, "w1"))
    }),

    // §2.8 math functions (IEEE-stable subset; transcendentals rounded).
    "q36_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("abs_qty"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          floor(col("l_extendedprice")).cast("long").as("floor_price"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          signum(col("l_discount") - lit(0.05)).cast("long").as("sgn_disc"),
          GeminiFunctions.truncate(col("l_extendedprice") / lit(100.0))
            .cast("long").as("trunc_price"))
        .transform(sorted1(_, "l_orderkey", "l_linenumber")) // bounded by the literal key filter
    }),

    // §2.7 UNION ALL BY NAME (column matching by name, not position).
    "q37_union_by_name" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey").as("id"),
        col("c_name").as("label"), lit("cust").as("src"))
      val b = t(s, dir, "supplier").select(lit("supp").as("src"),
        col("s_name").as("label"), col("s_suppkey").as("id"))
      a.unionByName(b)
        .groupBy(col("src")).agg(count(lit(1)).as("n"), min(col("id")).as("min_id"))
        .transform(sorted1(_, "src")) // 2 source rows
    }),

    // §2.8 IP functions — codegen'd Column forms (the UDF forms cost 43×
    // here: five interpreted per-row calls; oracle replicates the bit
    // math in SQL either way).
    "q38_ip_functions" -> ((s, dir) => {
      val ip = concat_ws(".", lit("10"),
        pmod(col("user_id"), lit(256)).cast("string"),
        pmod(col("user_id") * 7, lit(256)).cast("string"),
        pmod(col("user_id") * 13, lit(256)).cast("string"))
      t(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("ip", ip)
        .withColumn("masked24", GeminiFunctions.ipMaskC(col("ip"), lit(24)))
        .withColumn("prefix16", GeminiFunctions.ipPrefixC(col("ip"), lit(16)))
        .withColumn("in_10_8",
          GeminiFunctions.isSubnetOfC(lit("10.0.0.0/8"), col("ip")))
        .withColumn("sub_min", GeminiFunctions.ipSubnetMinC(col("prefix16")))
        .withColumn("sub_max", GeminiFunctions.ipSubnetMaxC(col("prefix16")))
        // distinct-user_id cardinality is DATA-dependent (a high-card tag
        // at 100 TB), not structural — single-task sort only on the
        // small profile; scale keeps the range sort (round-18, the q48 rule)
        .transform(sortedBounded(_, "user_id"))
    }),

    // §2.5 elapsed(1s).
    "q39_elapsed" -> ((s, dir) => {
      SeriesOps.elapsed(t(s, dir, "events"), "ts", Seq("user_id"),
          unitMicros = 1000000L, tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("elapsed"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // §2.5 absent: 1 for intervals with no data, on the dense spine.
    "q40_absent" -> ((s, dir) => {
      val agg = WindowedAgg.timeBucket(t(s, dir, "events"), "ts", "1 hour",
        Seq("event_type"), Seq(count(lit(1)).as("n")))
        .select("event_type", "wstart_ms", "n")
      Fill.fillValue(agg, Seq("n"), Seq("event_type"),
          EvStartMs, EvEndMs, HourMs)
        .withColumn("absent", when(col("n").isNull, lit(1)))
        .select("event_type", "wstart_ms", "absent")
        // spine-bounded result (5 types × 744 buckets)
        .transform(sorted1(_, "event_type", "wstart_ms"))
    }),

    // §2.5 exponential_moving_average(f, 10): final EMA per series (the
    // sequential fold matches DuckDB's list_reduce step for step).
    "q41_ema" -> ((s, dir) => {
      val perPoint = Smoothing.ema(t(s, dir, "events"), "value", "ts",
        Seq("user_id"), n = 10)
      // last row per series via max_by — reuses the EMA pass's
      // partitioning (no exchange) and skips the full descending
      // re-sort a rank would pay ((user_id, ts) is unique, so the pick
      // is exact)
      perPoint.groupBy(col("user_id"))
        .agg(max_by(col("ema"), col("_t")).as("ema_last"))
        .transform(sortedBounded(_, "user_id"))
    }),

    // §2.4 holt_winters(24, 24): one-day seasonal forecast over hourly
    // buckets (no SQL oracle — model recurrence; covered by unit tests).
    "q42_holt_winters" -> ((s, dir) => {
      val hourly = WindowedAgg.timeBucket(t(s, dir, "events"), "ts", "1 hour",
          Seq("event_type"), Seq(davg(col("value")).as("avg_value")))
        .select("event_type", "wstart_ms", "avg_value")
      Smoothing.holtWinters(hourly, "avg_value", "wstart_ms",
          Seq("event_type"), h = 24, m = 24)
        .select(col("event_type"), col("_t").as("t_ms"), col("hw"))
        .transform(sorted1(_, "event_type", "t_ms")) // spine+forecast-bounded
    }),

    // §2.5 irate: rate from the last two points per series.
    "q43_irate" -> ((s, dir) => {
      SeriesOps.irate(t(s, dir, "events"), "value", "ts", Seq("user_id"),
          tieBreak = Seq("event_id"))
        .transform(sortedBounded(_, "user_id"))
    }),

    // pipeline: multimodal column plumbing — binary payloads + stub decode
    // + feature extraction (no SQL oracle: codec stubs are hash-derived;
    // schema/batch shape covered by SourcesSpec).
    "q44_multimodal" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text").cast("binary").as("content"))
      val decoded = Multimodal.decodeImage(media, "content", "image/png")
      val agg = Multimodal.extractFeatures(decoded, "content", 8)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("media_meta.n_bytes")).as("sum_bytes"),
          dsum(element_at(col("features"), 1).cast("double"), 6).as("sum_f0"))
      // one REAL PNG fixture per distinct source (constant count at any
      // scale), decoded by the actual javax.imageio reader: the decoded
      // width/height must equal the encoded dimensions
      val pngU = udf((src: String) => Multimodal.JdkCodec.encodePng(
        1 + src.length % 31, 1 + src.length % 15, src.getBytes("UTF-8")))
      val fixtures = Multimodal.decodeImage(
        media.select("source").distinct().withColumn("png", pngU(col("source"))),
        "png", "image/png")
        .select(col("source"), col("media_meta.width").as("png_w"),
          col("media_meta.height").as("png_h"))
      // ≤5 source rows. Round-18 note: the round-17 "q44 regression" was
      // re-measured with an interleaved in-JVM A/B of this final sort vs
      // orderBy — the shapes are equivalent (repartition(1) ≤ orderBy in
      // every interleaved rep); the real cost was ImageIO's per-row DISK
      // stream cache in the decode stage (fixed in Multimodal.JdkCodec).
      agg.join(fixtures, "source").transform(sorted1(_, "source"))
    }),

    // §2.4 topn heavy hitters (exact form of topn_ddcm): top-3 users by
    // event count within each event_type.
    "q45_topn_freq" -> ((s, dir) => {
      val counted = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      // bounded heap, not a window: ranking by the 5 event_types would
      // put all counted series into 5 tasks
      SeriesOps.topPerSeries(counted, "cnt", "user_id",
          Seq("event_type"), 3)
        .select(col("event_type"), col("rank_in_series").as("rnk"),
          col("user_id"), col("cnt"))
        .transform(sorted1(_, "event_type", "rnk")) // 15 k-bounded rows
    }),

    // §2.4 count_values (PromQL): occurrences of each rounded value.
    "q46_count_values" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"), round(col("value"), 0).as("value_bucket"))
        .agg(count(lit(1)).as("n"))
        // the rounded-value histogram grows with the VALUE DOMAIN, not a
        // fixed dim — single-task sort only on the small profile (round 18)
        .transform(sortedBounded(_, "event_type", "value_bucket"))
    }),

    // §2.4 sample(n): systematic every-kth-point sample per series
    // (deterministic stand-in for the reference's reservoir sample).
    "q47_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(pmod(col("rn") - 1, lit(10)) === 0)
        .select(col("user_id"), col("event_id"), col("value"))
        .transform(sortedBounded(_, "user_id", "event_id"))
    }),

    // §2.2 filter blank: rows where all projected fields are null vanish.
    "q48_filter_blank" -> ((s, dir) => {
      val agg = WindowedAgg.timeBucket(t(s, dir, "events"), "ts", "1 hour",
        Seq("user_id"),
        Seq(dsum(when(col("event_type") === "error", col("value"))).as("sum_error"),
          dsum(when(col("event_type") === "purchase", col("value")))
            .as("sum_purchase")))
      Meta.filterBlank(agg, Seq("sum_error", "sum_purchase"))
        .select("user_id", "wstart_ms", "sum_error", "sum_purchase")
        // NO coalesce(1) here: unlike q07/q102 (fixed-cardinality
        // outputs) this result is users×hours — it GROWS with the data,
        // and the ×100 scaling run showed a single-partition sort of it
        // dominating the query (13 s of a 13 s run). The range exchange
        // costs one more scheduled job at sf0.1 and is the correct
        // shape at every scale above it.
        .transform(sortedBounded(_, "user_id", "wstart_ms"))
    }),

    // PromQL label_replace / label_join (§2.5 label functions).
    "q49_label_functions" -> ((s, dir) => {
      val relabeled = PromFunctions.labelReplace(t(s, dir, "events"),
        "short", "T-$1", "event_type", "^(..).*")
      PromFunctions.labelJoin(relabeled, "joined", "/",
          Seq("event_type", "short"))
        .groupBy(col("event_type"), col("short"), col("joined"))
        .agg(count(lit(1)).as("n"))
        .transform(sorted1(_, "event_type")) // ≤5 label rows
    }),

    // PromQL time functions (§2.5).
    "q50_time_functions" -> ((s, dir) => {
      val parts = PromFunctions.timeParts(col("ts"))
      t(s, dir, "events")
        .select(parts.map { case (n, c) => c.as(n) }: _*)
        .groupBy(col("day_of_week"), col("days_in_month"))
        .agg(count(lit(1)).as("n"), countDistinct(col("day_of_month")).as("n_days"),
          min(col("hour")).as("min_hour"), max(col("minute")).as("max_minute"))
        .transform(sorted1(_, "day_of_week")) // ≤7×2 calendar rows
    }),

    // PromQL histogram_quantile over cumulative le-buckets (§2.4).
    "q51_histogram_quantile" -> ((s, dir) => {
      val les = Seq(50.0, 100.0, 150.0, 1e18)
      val bucketAggs = les.zipWithIndex.map { case (l, i) =>
        count(when(col("value") <= l, 1)).cast("double").as(s"le_$i") }
      val buckets = t(s, dir, "events")
        .select(col("event_type"), col("value"))
        .groupBy(col("event_type"))
        .agg(bucketAggs.head, bucketAggs.tail: _*)
      val unpivoted = buckets.select(col("event_type"),
        posexplode(array(les.indices.map(i => col(s"le_$i")): _*))
          .as(Seq("i", "value")))
        .withColumn("le", element_at(
          array(les.map(lit): _*), col("i") + 1)).drop("i")
      PromFunctions.histogramQuantile(unpivoted, 0.9, Seq("event_type"))
        .withColumn("quantile", round(col("quantile"), 6))
        .transform(sorted1(_, "event_type")) // ≤5 tag rows
    }),

    // SHOW SERIES (meta surface): distinct tag sets of the measurement.
    "q52_show_series" -> ((s, dir) => {
      Meta.showSeries(t(s, dir, "events"), Seq("event_type", "user_id"))
    }),

    // §3.1 InfluxQL frontend end-to-end: parse → ladder → DataFrame,
    // treating events as measurement (tags=event_type, field=value).
    "q54_influxql_window" -> ((s, dir) => {
      val catalog = influxCatalog(s, dir)
      graft.query.InfluxQL.execute(catalog,
          "SELECT count(value), min(value), max(value), spread(value) " +
          "FROM events GROUP BY event_type, time(1h) fill(none) " +
          "ORDER BY time")
        .select("event_type", "time", "count", "min", "max", "spread")
    }),

    "q55_influxql_selectors" -> ((s, dir) => {
      val catalog = influxCatalog(s, dir)
      graft.query.InfluxQL.execute(catalog,
          "SELECT first(value), last(value), count(value) FROM events " +
          "WHERE value >= 50 GROUP BY event_type")
        .select("event_type", "first", "last", "count")
    }),

    // §2.4 topn_ddcm slot: CMS heavy hitters with in-aggregator candidate
    // tracking — the sketch AND the candidate set merge map-side, so the
    // shuffle carries one bounded buffer per partition and no raw keys,
    // no distinct-key enumeration, no window (no SQL oracle: approximate).
    "q56_topn_cms" -> ((s, dir) => {
      import graft.functions.Sketches
      val ev = t(s, dir, "events")
      val key = concat_ws("/", col("event_type"), col("user_id"))
      ev.agg(Sketches.cmsTopN(depth = 4, width = 512, maxCand = 1024,
          n = 5)(key).as("hits"))
        .select(explode(col("hits")).as("hit"))
        .select(col("hit.rnk").as("rnk"), col("hit.key").as("k"),
          col("hit.est").as("est"))
        .transform(sorted1(_, "rnk")) // 5 k-bounded rows
    }),

    // §2.4 approx sketch built-ins (HLL distinct + quantile sketch) —
    // rows-only: approximations are engine-specific by design.
    "q57_approx_sketches" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          expr("percentile_approx(value, 0.5, 1000)").as("approx_median"),
          countDistinct(col("user_id")).as("exact_users"))
        .transform(sorted1(_, "event_type")) // ≤5 tag rows
    }),

    // §2.5 PromQL range vectors: *_over_time + delta/rate at step evals.
    "q58_prom_over_time" -> ((s, dir) => {
      PromRange.overTime(t(s, dir, "events"), "ts", "value",
          Seq("event_type"), range = "2 hours", step = "1 hour")
        .select("event_type", "eval_ms", "count_ot", "sum_ot", "avg_ot",
          "min_ot", "max_ot", "delta", "rate")
        .transform(sorted1(_, "event_type", "eval_ms")) // eval-grid-bounded
    }),

    // §2.5 PromQL changes()/resets() — ordered in-window pair folds,
    // oracled via lag() per (series, window) in DuckDB.
    "q59_prom_changes_resets" -> ((s, dir) => {
      PromRange.changesResets(t(s, dir, "events"), "ts", "value",
          Seq("event_type"), range = "2 hours", step = "1 hour")
        .select("event_type", "eval_ms", "changes", "resets")
        .transform(sorted1(_, "event_type", "eval_ms")) // eval-grid-bounded
    }),

    // pipeline: token-window chunking with overlap (one row per chunk).
    "q60_chunking" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.chunk(col("text"), 40, 10)).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          length(col("c.chunk_text")).cast("long").as("chunk_chars"),
          size(split(col("c.chunk_text"), " ")).cast("long").as("chunk_tokens"))
        .transform(sortedBounded(_, "doc_id", "chunk_idx"))
    }),

    // pipeline: PII redaction (emails / IPv4s / digit runs → placeholders).
    "q61_pii_redaction" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"), col("text"),
          TextAnalysis.redactPii(col("text")).as("red"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("red") =!= col("text"), 1L).otherwise(0L))
            .as("n_redacted"),
          sum(length(col("text")).cast("long")).as("chars_in"),
          sum(length(col("red")).cast("long")).as("chars_out"))
        .transform(sorted1(_, "source")) // ≤5 source rows
    }),

    // pipeline: quality-gate retention per language.
    "q62_quality_filter" -> ((s, dir) => {
      val f = TextAnalysis.qualityFeatures(col("text"))
      t(s, dir, "documents").select(col("lang"),
          TextAnalysis.qualityKeep(f).as("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("retention",
          col("n_kept").cast("double") / col("n_docs"))
        .transform(sorted1(_, "lang")) // ≤5 lang rows
    }),

    // §2.4 castor_ad slot: per-series anomaly detection through the
    // group-windows boundary; the rolling z-score is a deterministic fold
    // oracled via window avg/stddev_samp (6dp rounding on the max).
    "q63_anomaly_detect" -> ((s, dir) => {
      AnomalyDetect.zscore(t(s, dir, "events"), "value", "ts",
          Seq("user_id"), window = 20, k = 2.5)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          // count on a 9dp-rounded |z|: the two engines' FP summation
          // orders inside a window frame differ, so a boundary-adjacent
          // z could flip the raw |z| > 2.5 comparison on one side only
          sum(when(round(abs(col("zscore")), 9) > 2.5, 1L).otherwise(0L))
            .as("n_anomalies"),
          round(max(abs(col("zscore"))), 6).as("max_abs_z"))
        // output is one row per user — a global range sort would pay a
        // partition-sampling job for a result this small; one-partition
        // sort gives the same order without it (upstream stays parallel)
        .repartition(1).sortWithinPartitions("user_id")
    }),

    // §3.1 frontend: arithmetic over aggregates (materialize on agg output).
    "q64_influxql_expr" -> ((s, dir) => {
      val catalog = influxCatalog(s, dir)
      graft.query.InfluxQL.execute(catalog,
          "SELECT max(value) - min(value) AS spread2, count(value), " +
          "count(value) * 2 + 1 AS n2 FROM events GROUP BY event_type")
        .select("event_type", "spread2", "count", "n2")
    })
  )
}
