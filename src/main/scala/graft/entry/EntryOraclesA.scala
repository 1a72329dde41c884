package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GeminiFunctions, PromFunctions}
import graft.operators.{Fill, Meta, PromBinOp, PromRange, SeriesOps, Smoothing, Unnest, WindowedAgg}
import graft.pipeline.{AnomalyDetect, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** DuckDB oracle SQL, first half. Mechanical split of SparkEntry.scala. */
trait EntryOraclesA extends EntryBase {
  protected def oracleSqlA: Map[String, String] = Map(
    "q01_agg_basic" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${sqlDsum("l_quantity")} AS sum_qty,
         ${sqlDsum("l_extendedprice")} AS sum_base_price,
         ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS sum_disc_price,
         ${sqlDavg("l_quantity")} AS avg_qty,
         count(*) AS n_rows
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
         l_extendedprice,
         l_extendedprice*(1-l_discount)*(1+l_tax) AS charge
         FROM lineitem
         WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",

    "q03_join_revenue" ->
      s"""SELECT r_name, n_name,
         ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q04_semi_join" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         ${sqlDsum("o_totalprice")} AS sum_price
         FROM orders WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
         min(c_custkey) AS min_custkey
         FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q06_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
         ORDER BY nationkey""",

    "q07_topk_per_group" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
           FROM orders) WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""",

    "q08_selectors_rate" ->
      """SELECT event_type,
         arg_min(value, ts) AS first, arg_max(value, ts) AS last,
         min(epoch_us(ts)) AS first_t_us, max(epoch_us(ts)) AS last_t_us,
         max(value) - min(value) AS spread, count(value) AS n,
         (arg_max(value, ts) - arg_min(value, ts)) /
           ((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0) AS rate
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q09_time_bucket" ->
      s"""SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS wstart_ms,
         count(*) AS n, ${sqlDsum("value")} AS sum_value,
         ${sqlDavg("value")} AS avg_value
         FROM events GROUP BY event_type, date_trunc('hour', ts)
         ORDER BY event_type, wstart_ms""",

    "q10_difference" ->
      s"""SELECT user_id, event_id, value, difference FROM (
           SELECT user_id, event_id, value,
             value - lag(value) OVER ($evWin) AS difference
           FROM events) WHERE difference IS NOT NULL
         ORDER BY user_id, event_id""",

    "q11_derivative" ->
      s"""SELECT user_id, event_id, derivative FROM (
           SELECT user_id, event_id,
             (value - lag(value) OVER ($evWin)) /
             ((epoch_us(ts) - lag(epoch_us(ts)) OVER ($evWin)) / 1000000.0)
             * 1.0 AS derivative
           FROM events) WHERE derivative IS NOT NULL
         ORDER BY user_id, event_id""",

    "q12_moving_average" ->
      s"""SELECT user_id, event_id, moving_average FROM (
           SELECT user_id, event_id,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) /
               count(value) OVER w AS moving_average,
             count(value) OVER w AS wn
           FROM events WINDOW w AS ($evWin
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         WHERE wn = 5 ORDER BY user_id, event_id""",

    "q13_cumulative_sum" ->
      s"""SELECT user_id, event_id,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER ($evWin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cumulative_sum
         FROM events ORDER BY user_id, event_id""",

    "q14_integral" ->
      s"""SELECT user_id,
         CAST(sum(trap) AS DOUBLE) / 2000.0 AS integral FROM (
           SELECT user_id,
             CAST(value + lag(value) OVER ($evWin) AS DECIMAL(18,2)) *
             CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER ($evWin)) // 1000
               AS DECIMAL(10,0)) AS trap
           FROM events)
         GROUP BY user_id ORDER BY user_id""",

    "q15_sliding_window" ->
      s"""SELECT event_type, wstart_ms, count(*) AS n,
         ${sqlDsum("value")} AS sum_value FROM (
           SELECT event_type, value,
             unnest([epoch_ms(date_trunc('hour', ts)),
                     epoch_ms(date_trunc('hour', ts)) - 3600000]) AS wstart_ms
           FROM events)
         GROUP BY event_type, wstart_ms ORDER BY event_type, wstart_ms""",

    "q16_per_series_limit" ->
      s"""SELECT user_id, event_id, value FROM (
           SELECT user_id, event_id, value,
             row_number() OVER ($evWin) AS rn FROM events)
         WHERE rn <= 3 ORDER BY user_id, event_id""",

    "q17_fill_previous" ->
      s"""WITH series AS (SELECT DISTINCT event_type FROM events),
         spine AS (SELECT event_type,
           unnest(generate_series(${EvStartMs}, ${EvEndMs - HourMs}, ${HourMs}))
             AS wstart_ms FROM series),
         agg AS (SELECT event_type,
           epoch_ms(date_trunc('hour', ts)) AS wstart_ms,
           ${sqlDavg("value")} AS avg_value
           FROM events GROUP BY event_type, date_trunc('hour', ts))
         SELECT s.event_type, s.wstart_ms,
           last_value(a.avg_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.wstart_ms
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value
         FROM spine s LEFT JOIN agg a
           ON s.event_type = a.event_type AND s.wstart_ms = a.wstart_ms
         ORDER BY s.event_type, s.wstart_ms""",

    "q18_fill_linear" ->
      s"""WITH series AS (SELECT DISTINCT event_type FROM events),
         spine AS (SELECT event_type,
           unnest(generate_series(${EvStartMs}, ${EvEndMs - HourMs}, ${HourMs}))
             AS wstart_ms FROM series),
         agg AS (SELECT event_type,
           epoch_ms(date_trunc('hour', ts)) AS wstart_ms,
           ${sqlDavg("value")} AS avg_value
           FROM events GROUP BY event_type, date_trunc('hour', ts)),
         dense AS (SELECT s.event_type, s.wstart_ms, a.avg_value
           FROM spine s LEFT JOIN agg a
             ON s.event_type = a.event_type AND s.wstart_ms = a.wstart_ms),
         ctx AS (SELECT event_type, wstart_ms, avg_value,
           last_value(avg_value IGNORE NULLS) OVER wp AS pv,
           first_value(avg_value IGNORE NULLS) OVER wn AS nv,
           last_value(CASE WHEN avg_value IS NOT NULL THEN wstart_ms END
             IGNORE NULLS) OVER wp AS pt,
           first_value(CASE WHEN avg_value IS NOT NULL THEN wstart_ms END
             IGNORE NULLS) OVER wn AS nt
           FROM dense WINDOW
           wp AS (PARTITION BY event_type ORDER BY wstart_ms
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY event_type ORDER BY wstart_ms
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_type, wstart_ms,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
                THEN pv + (nv - pv) * (wstart_ms - pt) / (nt - pt)
           END AS avg_value
         FROM ctx ORDER BY event_type, wstart_ms""",

    "q19_cte_top_customers" ->
      s"""WITH rev AS (SELECT o_custkey,
           ${sqlDsum("o_totalprice")} AS revenue, count(*) AS n_orders
           FROM orders GROUP BY o_custkey)
         SELECT c_custkey, c_name, revenue, n_orders
         FROM rev JOIN customer ON o_custkey = c_custkey
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q20_conditional_agg" ->
      s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         ${sqlDsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END", 6)} AS promo_revenue,
         ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS total_revenue,
         count(*) AS n_items,
         ${sqlDsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END", 6)} /
           ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS promo_share
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY year(l_shipdate) ORDER BY ship_year""",

    "q21_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.25), 6) AS p25,
         round(quantile_cont(l_quantity, 0.5), 6) AS median,
         round(quantile_cont(l_quantity, 0.9), 6) AS p90,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         max(l_quantity) - min(l_quantity) AS spread,
         round(stddev_samp(l_quantity), 6) AS stddev_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q22_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
         substr(p_name, 1, 12) AS name_prefix,
         CAST(length(p_name) AS BIGINT) AS name_len,
         split_part(p_name, ' ', 1) AS first_word,
         replace(p_brand, 'Brand#', 'B') AS brand_short,
         concat_ws('|', p_brand, p_type) AS brand_type,
         CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev
         FROM part ORDER BY p_partkey""",

    "q23_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
         FROM documents GROUP BY text ORDER BY keep_id""",

    "q24_text_quality" ->
      s"""WITH feats AS (SELECT lang,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           length(regexp_replace(text, '\\s', '', 'g')) AS n_nospace,
           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             t -> t IN ('the','a','an','and','or','of','to','in','is','on',
                        'for','with','as','at','by'))) AS n_stop,
           length(text) AS n_chars FROM documents)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           ${sqlDsum("n_nospace / CAST(n_tokens AS DOUBLE)", 8)} AS sum_mwl,
           ${sqlDsum("n_punct / greatest(CAST(n_chars AS DOUBLE), 1.0)", 8)} AS sum_punct,
           ${sqlDsum("n_stop / CAST(n_tokens AS DOUBLE)", 8)} AS sum_stop
         FROM feats GROUP BY lang ORDER BY lang""",

    "q25_token_count" ->
      """SELECT source, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_bpe,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS sum_ws
         FROM documents GROUP BY source ORDER BY source""",

    "q26_lang_id" -> {
      val markers = TextAnalysis.langMarkers.toSeq.sortBy(_._1).map {
        case (lang, words) =>
          val pat = words.map(java.util.regex.Pattern.quote)
            .mkString("(?:^|\\s)(?:", "|", ")(?:\\s|$)")
          s"('$lang', '$pat')"
      }.mkString(", ")
      s"""WITH scores AS (SELECT doc_id, lang, m.plang,
           len(regexp_extract_all(text, m.pat)) AS score
           FROM documents, (VALUES $markers) m(plang, pat)),
         ranked AS (SELECT doc_id, lang, plang,
           row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, plang ASC) AS rn FROM scores)
         SELECT lang, plang AS predicted, count(*) AS n_docs
         FROM ranked WHERE rn = 1
         GROUP BY lang, plang ORDER BY lang, predicted"""
    },

    "q27_knn_cosine" -> {
      def dd(a: String, b: String) =
        s"""list_sum(list_transform(range(1, 65),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"""
      s"""WITH scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ${dd("q", "c")} / (sqrt(${dd("q", "q")}) * sqrt(${dd("c", "c")}))
             AS cosraw
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
         ranked AS (SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cosraw DESC, neighbor_id ASC) AS rank, cosraw
           FROM scored)
         SELECT query_id, neighbor_id, rank, round(cosraw, 6) AS cos
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q30_slimit" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE event_type IN (SELECT DISTINCT event_type FROM events
           ORDER BY event_type LIMIT 3)
         GROUP BY event_type ORDER BY event_type""",

    "q31_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q32_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n FROM (
           SELECT l_returnflag, l_quantity, count(*) AS cnt,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY count(*) DESC, l_quantity ASC) AS rn
           FROM lineitem GROUP BY l_returnflag, l_quantity)
         WHERE rn = 1 ORDER BY l_returnflag""",

    "q33_full_outer" ->
      """SELECT coalesce(c.c_nationkey, p.s_nationkey) AS nationkey,
         coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
               GROUP BY c_nationkey) c
         FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier
               GROUP BY s_nationkey) p
           ON c.c_nationkey = p.s_nationkey
         ORDER BY nationkey""",

    "q34_json_extract" ->
      """SELECT event_type, count(k_val) AS n,
         CAST(sum(k_val) AS BIGINT) AS sum_k, max(k_val) AS max_k FROM (
           SELECT event_type,
             CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '')
               AS BIGINT) AS k_val
           FROM events)
         GROUP BY event_type ORDER BY event_type""",

    "q35_unnest_regex" ->
      """SELECT w1, count(*) AS n, count(DISTINCT w2) AS n_w2 FROM (
           SELECT regexp_extract(text, '^(\w+) (\w+)', 1) AS w1,
                  regexp_extract(text, '^(\w+) (\w+)', 2) AS w2
           FROM documents)
         GROUP BY w1 ORDER BY w1""",

    "q36_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         abs(-l_quantity) AS abs_qty, sqrt(l_quantity) AS sqrt_qty,
         CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
         round(ln(l_extendedprice), 6) AS ln_price,
         round(exp(l_discount), 6) AS exp_disc,
         CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn_disc,
         CAST(trunc(l_extendedprice / 100.0) AS BIGINT) AS trunc_price
         FROM lineitem WHERE l_orderkey <= 1000
         ORDER BY l_orderkey, l_linenumber""",

    "q37_union_by_name" ->
      """SELECT src, count(*) AS n, min(id) AS min_id FROM (
           SELECT c_custkey AS id, c_name AS label, 'cust' AS src FROM customer
           UNION ALL BY NAME
           SELECT 'supp' AS src, s_name AS label, s_suppkey AS id FROM supplier)
         GROUP BY src ORDER BY src""",

    "q38_ip_functions" ->
      """SELECT user_id,
         '10.' || (user_id % 256) || '.' || ((user_id * 7) % 256) || '.' ||
           ((user_id * 13) % 256) AS ip,
         '10.' || (user_id % 256) || '.' || ((user_id * 7) % 256) || '.0'
           AS masked24,
         '10.' || (user_id % 256) || '.0.0/16' AS prefix16,
         true AS in_10_8,
         '10.' || (user_id % 256) || '.0.0' AS sub_min,
         '10.' || (user_id % 256) || '.255.255' AS sub_max
         FROM (SELECT DISTINCT user_id FROM events) ORDER BY user_id""",

    "q39_elapsed" ->
      s"""SELECT user_id, event_id, elapsed FROM (
           SELECT user_id, event_id,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER ($evWin)) / 1000000
               AS elapsed
           FROM events) WHERE elapsed IS NOT NULL
         ORDER BY user_id, event_id""",

    "q40_absent" ->
      s"""WITH series AS (SELECT DISTINCT event_type FROM events),
         spine AS (SELECT event_type,
           unnest(generate_series(${EvStartMs}, ${EvEndMs - HourMs}, ${HourMs}))
             AS wstart_ms FROM series),
         agg AS (SELECT event_type,
           epoch_ms(date_trunc('hour', ts)) AS wstart_ms, count(*) AS n
           FROM events GROUP BY event_type, date_trunc('hour', ts))
         SELECT s.event_type, s.wstart_ms,
           CASE WHEN a.n IS NULL THEN 1 END AS absent
         FROM spine s LEFT JOIN agg a
           ON s.event_type = a.event_type AND s.wstart_ms = a.wstart_ms
         ORDER BY s.event_type, s.wstart_ms""",

    "q41_ema" ->
      """SELECT user_id,
         list_reduce(list(value ORDER BY epoch_us(ts), event_id),
           (acc, v) -> (2.0/11.0) * v + (1 - 2.0/11.0) * acc) AS ema_last
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q43_irate" ->
      s"""SELECT user_id,
         (max(CASE WHEN rn = 1 THEN value END) -
          max(CASE WHEN rn = 2 THEN value END)) /
         ((max(CASE WHEN rn = 1 THEN tus END) -
           max(CASE WHEN rn = 2 THEN tus END)) / 1000000.0) AS irate
         FROM (SELECT user_id, value, epoch_us(ts) AS tus,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events) WHERE rn <= 2
         GROUP BY user_id ORDER BY user_id""",

    "q45_topn_freq" ->
      """SELECT event_type, rnk, user_id, cnt FROM (
           SELECT event_type, user_id, count(*) AS cnt,
             row_number() OVER (PARTITION BY event_type
               ORDER BY count(*) DESC, user_id ASC) AS rnk
           FROM events GROUP BY event_type, user_id)
         WHERE rnk <= 3 ORDER BY event_type, rnk""",

    "q46_count_values" ->
      """SELECT event_type, round(value, 0) AS value_bucket, count(*) AS n
         FROM events GROUP BY event_type, round(value, 0)
         ORDER BY event_type, value_bucket""",

    "q47_sample" ->
      s"""SELECT user_id, event_id, value FROM (
           SELECT user_id, event_id, value,
             row_number() OVER ($evWin) AS rn FROM events)
         WHERE (rn - 1) % 10 = 0 ORDER BY user_id, event_id""",

    "q48_filter_blank" ->
      """SELECT user_id, wstart_ms, sum_error, sum_purchase FROM (
           SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS wstart_ms,
             CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value END
               AS DECIMAL(18,4))) AS DOUBLE) AS sum_error,
             CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END
               AS DECIMAL(18,4))) AS DOUBLE) AS sum_purchase
           FROM events GROUP BY user_id, date_trunc('hour', ts))
         WHERE coalesce(sum_error, sum_purchase) IS NOT NULL
         ORDER BY user_id, wstart_ms""",

    "q49_label_functions" ->
      """SELECT event_type,
         regexp_replace(event_type, '^(..).*', 'T-\1') AS short,
         event_type || '/' || regexp_replace(event_type, '^(..).*', 'T-\1')
           AS joined,
         count(*) AS n
         FROM events GROUP BY 1, 2, 3 ORDER BY event_type""",

    "q50_time_functions" ->
      """SELECT dayofweek(ts) AS day_of_week,
         day(last_day(ts)) AS days_in_month, count(*) AS n,
         count(DISTINCT day(ts)) AS n_days,
         min(hour(ts)) AS min_hour, max(minute(ts)) AS max_minute
         FROM events GROUP BY 1, 2 ORDER BY day_of_week""",

    "q51_histogram_quantile" ->
      """WITH buckets AS (SELECT event_type,
           CAST(count(CASE WHEN value <= 50.0 THEN 1 END) AS DOUBLE) AS b1,
           CAST(count(CASE WHEN value <= 100.0 THEN 1 END) AS DOUBLE) AS b2,
           CAST(count(CASE WHEN value <= 150.0 THEN 1 END) AS DOUBLE) AS b3,
           CAST(count(CASE WHEN value <= 1e18 THEN 1 END) AS DOUBLE) AS b4
           FROM events GROUP BY event_type),
         unp AS (SELECT event_type,
           unnest([50.0, 100.0, 150.0, 1e18]) AS le,
           unnest([b1, b2, b3, b4]) AS value FROM buckets),
         staged AS (SELECT event_type, le, value,
           0.9 * max(value) OVER (PARTITION BY event_type) AS target,
           lag(le) OVER w AS prev_le, lag(value) OVER w AS prev_v
           FROM unp WINDOW w AS (PARTITION BY event_type ORDER BY le)),
         cand AS (SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY le) AS rn
           FROM staged WHERE value >= target)
         SELECT event_type,
           round(CASE WHEN prev_v IS NULL THEN le * target / value
             ELSE prev_le + (le - prev_le) * (target - prev_v) /
               (value - prev_v) END, 6) AS quantile
         FROM cand WHERE rn = 1 ORDER BY event_type""",

    "q52_show_series" ->
      """SELECT DISTINCT 'event_type=' || event_type || ',user_id=' || user_id
           AS series_key
         FROM events ORDER BY series_key""",

    "q53_embedding_neardup" -> {
      def dd(a: String, b: String) =
        s"""list_sum(list_transform(range(1, 65),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"""
      s"""SELECT id_a, id_b, round(cos, 6) AS cos FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${dd("a", "b")} / (sqrt(${dd("a", "a")}) * sqrt(${dd("b", "b")}))
               AS cos
           FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         WHERE cos >= 0.45 ORDER BY id_a, id_b"""
    },

    // The oracle replays the banded sign-LSH algorithm itself: the ±1
    // hyperplane weights are deterministic splitmix64 constants
    // (Similarity.planeWeights), embedded as SQL literals; list_sum(
    // list_transform(range…)) folds in the same sequential order as
    // Spark's zip_with+aggregate, so the projections (and hence the band
    // signatures and cosines) are bit-identical across engines. The
    // 8-way OR join is the oracle-side stand-in for the distributed
    // (band, signature) equi-join — quadratic is fine at oracle scale.
    "q88_neardup_banded" -> {
      val dim = 64; val planes = 64; val bands = 8; val r = planes / bands
      def wlit(p: Int) = graft.pipeline.Similarity.planeWeights(p, dim)
        .map(w => if (w > 0) "1" else "-1").mkString("[", ",", "]")
      def proj(p: Int) =
        s"list_sum(list_transform(range(1, ${dim + 1}), " +
          s"i -> CAST(e[i] AS DOUBLE) * (${wlit(p)})[i]))"
      val bandExprs = (0 until bands).map { b =>
        (0 until r).map { j =>
          s"(CASE WHEN ${proj(b * r + j)} >= 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
      }
      val bandCols = bandExprs.zipWithIndex
        .map { case (ex, b) => s"$ex AS band$b" }.mkString(", ")
      val anyBand = (0 until bands)
        .map(b => s"sa.band$b = sb.band$b").mkString(" OR ")
      def dd(a: String, b: String) =
        s"""list_sum(list_transform(range(1, ${dim + 1}),
           i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"""
      s"""WITH sig AS (
           SELECT vec_id AS id, $bandCols
           FROM (SELECT vec_id, embedding AS e FROM embeddings)),
         cand AS (
           SELECT sa.id AS id_a, sb.id AS id_b FROM sig sa, sig sb
           WHERE sa.id < sb.id AND ($anyBand))
         SELECT id_a, id_b, round(cos, 6) AS cos FROM (
           SELECT c.id_a, c.id_b,
             ${dd("a", "b")} / (sqrt(${dd("a", "a")}) * sqrt(${dd("b", "b")}))
               AS cos
           FROM cand c
           JOIN embeddings a ON a.vec_id = c.id_a
           JOIN embeddings b ON b.vec_id = c.id_b)
         WHERE cos >= 0.4 ORDER BY id_a, id_b"""
    },

    "q54_influxql_window" ->
      """SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS time,
         count(value) AS count, min(value) AS min, max(value) AS max,
         max(value) - min(value) AS spread
         FROM events GROUP BY event_type, date_trunc('hour', ts)
         ORDER BY event_type, time""",

    "q55_influxql_selectors" ->
      """SELECT event_type, arg_min(value, ts) AS first,
         arg_max(value, ts) AS last, count(value) AS count
         FROM events WHERE value >= 50
         GROUP BY event_type ORDER BY event_type""",

    "q64_influxql_expr" ->
      """SELECT event_type, max(value) - min(value) AS spread2,
         count(value) AS count, count(value) * 2 + 1 AS n2
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q65_influxql_subquery" ->
      """SELECT event_type, max(count) AS max FROM (
           SELECT event_type, count(value) AS count
           FROM events GROUP BY event_type, date_trunc('hour', ts))
         GROUP BY event_type ORDER BY event_type""",

    "q66_show_field_keys" ->
      """SELECT * FROM (VALUES
           ('event_id', 'integer'), ('props', 'string'),
           ('user_id', 'integer'), ('value', 'float'))
         t(fieldKey, fieldType) ORDER BY fieldKey""",

    "q86_promql_absent" ->
      """WITH bounds AS (
           SELECT (epoch_ms(min(ts)) + 3599999) // 3600000 AS kmin,
                  (epoch_ms(max(ts)) + 3599999) // 3600000 AS kmax
           FROM events),
         grid AS (
           SELECT unnest(generate_series(kmin, kmax)) * 3600000 AS eval_ms
           FROM bounds),
         present AS (
           SELECT DISTINCT k * 3600000 AS eval_ms
           FROM (SELECT (epoch_us(ts) - 1000) // 1000 AS tms FROM events
                 WHERE event_type = 'error'
                   AND CAST(user_id AS VARCHAR) = '1'),
             unnest(generate_series(tms // 3600000 + 1,
               (tms + 3600001) // 3600000)) AS t(k))
         SELECT 'error' AS event_type, '1' AS "user", eval_ms,
           1.0 AS value
         FROM grid
         WHERE eval_ms NOT IN (SELECT eval_ms FROM present)
         ORDER BY eval_ms""",

    // Subquery: inner = q73's hourly instant sums; outer window membership
    // mirrors the -1ms end-inclusive rule on the inner eval epochs
    // (t' = eval_ms - 1, range 2h).
    "q85_promql_subquery" ->
      """WITH iv AS (
           SELECT event_type, CAST(user_id AS VARCHAR) AS usr,
             k * 3600000 AS eval_ms,
             last(value ORDER BY epoch_us(ts), event_id) AS v
           FROM (SELECT *, (epoch_us(ts) - 1000) // 1000 AS tms FROM events),
             unnest(generate_series(tms // 3600000 + 1,
               (tms + 3600001) // 3600000)) AS t(k)
           GROUP BY 1, 2, 3),
         sums AS (
           SELECT event_type, eval_ms,
             CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) AS sv
           FROM iv GROUP BY 1, 2),
         outer_pts AS (
           SELECT event_type, sv, k2 * 3600000 AS out_ms
           FROM sums,
             unnest(generate_series((eval_ms - 1) // 3600000 + 1,
               ((eval_ms - 1) + 7200000) // 3600000)) AS t(k2))
         SELECT event_type, out_ms AS eval_ms, max(sv) AS value
         FROM outer_pts GROUP BY 1, 2 ORDER BY 1, 2""",

    // Mirrors PromRange.linearRegression: x in seconds from window start,
    // DECIMAL(28,6) moment sums, identical closing float shapes.
    "q84_prom_deriv" ->
      """WITH pts AS (
           SELECT event_type, value, epoch_us(ts) AS tus,
             unnest([epoch_ms(date_trunc('hour', ts)) + 3600000,
                     epoch_ms(date_trunc('hour', ts)) + 7200000]) AS eval_ms
           FROM events),
         agg AS (
           SELECT event_type, eval_ms, count(*) AS n,
             CAST(sum(CAST((tus - (eval_ms - 7200000)*1000)/1000000.0
               AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST((tus - (eval_ms - 7200000)*1000)/1000000.0
               * value AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST((tus - (eval_ms - 7200000)*1000)/1000000.0
               * ((tus - (eval_ms - 7200000)*1000)/1000000.0)
               AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             min(tus) AS t0, max(tus) AS t1
           FROM pts GROUP BY 1, 2),
         m AS (
           SELECT *, (n*sxy - sx*sy)/(n*sxx - sx*sx) AS slope
           FROM agg WHERE n > 1 AND t1 <> t0)
         SELECT event_type, eval_ms, n,
           round(slope, 6) AS deriv,
           round((sy/n - slope*(sx/n)) + slope*(7200.0 + 600.0), 3)
             AS predict
         FROM m ORDER BY event_type, eval_ms""",

    "q83_scalar_stragglers" ->
      """SELECT event_id,
         'https://h' || user_id || '.example.com:' || (event_id % 100 + 8000)
           || '/p/' || event_id || '?k=' || (event_id % 7) AS url,
         (CASE WHEN user_id % 4 = 0 THEN '10.'
               WHEN user_id % 4 = 1 THEN '127.'
               WHEN user_id % 4 = 2 THEN '224.'
               ELSE '8.' END) || (user_id % 200) || '.' || (event_id % 250)
           || '.7' AS ip,
         CAST(event_id % 7 AS VARCHAR) AS param_k,
         event_id % 100 + 8000 AS port,
         CASE WHEN user_id % 4 = 0 THEN 'intranet'
              WHEN user_id % 4 = 1 THEN 'loopback'
              WHEN user_id % 4 = 2 THEN 'multicast'
              ELSE 'internet' END AS domain_class
         FROM events ORDER BY event_id""",

    "q77_influxql_union" ->
      """SELECT * FROM (
           SELECT 0 AS time, count(value) AS count, min(value) AS min,
             max(value) AS max FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT 0 AS time, count(value) AS count, min(value) AS min,
             max(value) AS max FROM events WHERE event_type = 'error'
           UNION
           SELECT 0 AS time, count(value) AS count, min(value) AS min,
             max(value) AS max FROM events WHERE event_type = 'error')
         ORDER BY count""",

    "q78_influxql_in_subquery" ->
      """SELECT event_type, count(value) AS count FROM events
         WHERE user_id IN (SELECT DISTINCT user_id FROM events
                           WHERE value > 99)
         GROUP BY event_type ORDER BY event_type""",

    "q79_show_tag_values" ->
      """SELECT DISTINCT 'event_type' AS key,
           CAST(event_type AS VARCHAR) AS value
         FROM events ORDER BY value""",

    "q80_influxql_tz" ->
      """SELECT epoch_ms(date_trunc('day', ts - INTERVAL 5 HOUR)
           + INTERVAL 5 HOUR) AS time, count(value) AS count
         FROM events GROUP BY 1 ORDER BY 1""",

    "q81_influxql_time_offset" ->
      """SELECT ((epoch_ms(ts) - 900000) // 3600000) * 3600000 + 900000
           AS time, count(value) AS count
         FROM events GROUP BY 1 ORDER BY 1""",

    // PromQL instant-vector evaluation, mirrored exactly: lookback window
    // [T-1h, T] at 1h steps is implemented in Spark as a window of
    // 3600001 ms over timestamps nudged -1ms for assignment; in ms space
    // that membership is  tms//ss + 1 <= k <= (tms + 3600001)//ss  with
    // tms = (t_us - 1000)//1000 — the formulas below are that, verbatim.
    "q73_promql_agg" ->
      """WITH iv AS (
           SELECT event_type, CAST(user_id AS VARCHAR) AS usr,
             k * 3600000 AS eval_ms,
             last(value ORDER BY epoch_us(ts), event_id) AS v
           FROM (SELECT *, (epoch_us(ts) - 1000) // 1000 AS tms FROM events),
             unnest(generate_series(tms // 3600000 + 1,
               (tms + 3600001) // 3600000)) AS t(k)
           GROUP BY 1, 2, 3)
         SELECT event_type, eval_ms,
           CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) AS value
         FROM iv GROUP BY 1, 2 ORDER BY 1, 2""",

    "q74_promql_binop" ->
      """WITH iv AS (
           SELECT event_type, CAST(user_id AS VARCHAR) AS "user",
             k * 3600000 AS eval_ms,
             last(value ORDER BY epoch_us(ts), event_id) AS v
           FROM (SELECT *, (epoch_us(ts) - 1000) // 1000 AS tms FROM events),
             unnest(generate_series(tms // 3600000 + 1,
               (tms + 3600001) // 3600000)) AS t(k)
           GROUP BY 1, 2, 3),
         s AS (
           SELECT event_type, eval_ms,
             CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) AS sv
           FROM iv GROUP BY 1, 2)
         SELECT iv.event_type, iv."user", iv.eval_ms,
           CAST(iv.v AS DOUBLE) / CAST(s.sv AS DOUBLE) AS value
         FROM iv JOIN s USING (event_type, eval_ms)
         ORDER BY 1, 2, 3"""
  )
}
