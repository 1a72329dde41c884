package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Per-series analytic functions — the reference's "transform" family that
  * operates on one series (tag set) ordered by time:
  * difference/derivative/elapsed/moving_average/cumulative_sum/integral/
  * rate/irate (reference: `engine/executor/call_processor.go:151-194`).
  *
  * Spark-first design: every op is a `Window.partitionBy(tags).orderBy(time)`
  * expression, which Catalyst plans as a single shuffle on the tag columns
  * followed by an in-partition sort — the same data movement the reference
  * needs (series are its physical partitioning), so this scales linearly
  * with the number of series at 100 TB. No UDFs — everything stays inside
  * whole-stage codegen.
  *
  * `tieBreak` columns make the in-series order total when timestamps can
  * collide (openGemini dedups identical-ns points at write time; parquet
  * inputs may not be deduped, so callers pass a unique id).
  */
object SeriesOps {

  private def w(tags: Seq[String], time: String,
                tieBreak: Seq[String]): WindowSpec =
    Window.partitionBy(tags.map(col): _*)
      .orderBy((time +: tieBreak).map(col): _*)

  /** Epoch-microseconds view of the time column (timestamp or numeric). */
  private def tMicros(df: DataFrame, time: String): Column =
    df.schema(time).dataType match {
      case TimestampType => unix_micros(col(time))
      case _ => col(time).cast("long")
    }

  /** difference(f): pairwise delta vs previous point in the series.
    * Reference: `call_processor.go:151` (non_negative variant :154). */
  def difference(df: DataFrame, field: String, time: String, tags: Seq[String],
                 nonNegative: Boolean = false,
                 tieBreak: Seq[String] = Nil,
                 direction: String = "behind",
                 descTime: Boolean = false): DataFrame = {
    // descTime: ORDER BY time DESC statements difference over the
    // DESC-iterated series (the reference's transform runs in the
    // statement's direction — signs and emitted rows flip)
    val win =
      if (descTime)
        Window.partitionBy(tags.map(col): _*)
          .orderBy((time +: tieBreak).map(col(_).desc): _*)
      else w(tags, time, tieBreak)
    val d = diffDirected(
      col(field) - lag(col(field), 1).over(win), direction)
    val out = df.withColumn("difference", d).filter(col("difference").isNotNull)
    if (nonNegative) out.filter(col("difference") >= 0) else out
  }

  /** difference(f, 'front'|'behind'|'absolute') — `behind` (the default)
    * is curr−prev, `front` prev−curr, `absolute` |prev−curr|
    * (`engine/executor/agg_func.go:72-86` Front/Behind/AbsoluteDiffFunc;
    * arg validation `query/agg_functions.go:1068`). */
  private def diffDirected(behind: Column, direction: String): Column =
    direction match {
      case "behind"   => behind
      case "front"    => -behind
      case "absolute" => abs(behind)
      case other => throw new IllegalArgumentException(
        s"the second argument must be front, behind or absolute, got $other")
    }

  /** derivative(f, unit): delta / elapsed-time * unit (unit in seconds).
    * Reference: `call_processor.go:158` (non_negative variant :158-165 —
    * negative rates dropped, not clamped). */
  def derivative(df: DataFrame, field: String, time: String, tags: Seq[String],
                 unitSeconds: Double = 1.0,
                 tieBreak: Seq[String] = Nil,
                 nonNegative: Boolean = false): DataFrame = {
    val win = w(tags, time, tieBreak)
    val tus = tMicros(df, time)
    val dv = col(field) - lag(col(field), 1).over(win)
    val dtSec = (tus - lag(tus, 1).over(win)).cast("double") / 1e6
    val out = df.withColumn("derivative", dv / dtSec * lit(unitSeconds))
      .filter(col("derivative").isNotNull)
    if (nonNegative) out.filter(col("derivative") >= 0) else out
  }

  /** elapsed(f, unit): time delta between consecutive points, integer units.
    * Reference: `call_processor.go:166`. */
  def elapsed(df: DataFrame, time: String, tags: Seq[String],
              unitMicros: Long = 1000000L,
              tieBreak: Seq[String] = Nil): DataFrame = {
    val tus = tMicros(df, time)
    df.withColumn("elapsed",
        (tus - lag(tus, 1).over(w(tags, time, tieBreak))) / lit(unitMicros))
      .filter(col("elapsed").isNotNull)
  }

  /** moving_average(f, n): trailing mean of the last n points; emitted only
    * once a full window of n points exists (InfluxQL semantics).
    * Reference: `call_processor.go:172`.
    * The mean is computed as an exact DECIMAL sum / count so results are
    * order-independent and reproducible across engines. */
  def movingAverage(df: DataFrame, field: String, time: String,
                    tags: Seq[String], n: Int,
                    tieBreak: Seq[String] = Nil,
                    floatMath: Boolean = false): DataFrame = {
    val frame = w(tags, time, tieBreak).rowsBetween(-(n - 1), 0)
    // floatMath: per-frame float64 accumulation (the reference's
    // FloatMovingAverageItem keeps a ROLLING sum — agg_iterator.gen
    // .go:3046 — so a frame recompute can still differ in the last ulp;
    // the InfluxQL text path wants the float family, the DataFrame gates
    // keep the order-independent DECIMAL contract)
    val s0 =
      if (floatMath) sum(col(field).cast("double")).over(frame)
      else sum(col(field).cast("decimal(18,6)")).over(frame)
    val cnt = count(col(field)).over(frame)
    df.withColumn("moving_average", s0.cast("double") / cnt)
      .withColumn("_n", cnt).filter(col("_n") === n).drop("_n")
  }

  /** cumulative_sum(f): running sum per series (exact DECIMAL accumulation
    * by default; `floatMath` switches to sequential float64 — identical
    * adds to the reference's `sum += v` loop).
    * Reference: `call_processor.go:179`. */
  def cumulativeSum(df: DataFrame, field: String, time: String,
                    tags: Seq[String], tieBreak: Seq[String] = Nil,
                    floatMath: Boolean = false): DataFrame = {
    val acc =
      if (floatMath) sum(col(field).cast("double"))
      else sum(col(field).cast("decimal(18,6)"))
    df.withColumn("cumulative_sum",
      acc.over(w(tags, time, tieBreak).rowsBetween(Window.unboundedPreceding, 0))
        .cast("double"))
  }

  /** integral(f, unit): trapezoidal area under the curve, per series.
    * Reference: `call_processor.go:184`. Emits one row per series. */
  def integral(df: DataFrame, field: String, time: String, tags: Seq[String],
               unitSeconds: Double = 1.0,
               tieBreak: Seq[String] = Nil): DataFrame = {
    val win = w(tags, time, tieBreak)
    val tus = tMicros(df, time)
    // Trapezoid term as exact decimal: only the small pair-sum (~field
    // magnitude) crosses double→decimal; the ms delta is an exact integer;
    // the /2 and ms→unit divisions happen once on the final sum. Scales are
    // chosen so the scaled sum stays under 2^53 — above that, decimal→double
    // conversion is no longer identical across engines.
    val pairSum = (col(field) + lag(col(field), 1).over(win))
      .cast("decimal(18,2)")
    val dtMs = ((tus - lag(tus, 1).over(win)) / lit(1000)).cast("long")
      .cast("decimal(10,0)")
    df.withColumn("_trap", pairSum * dtMs)
      .groupBy(tags.map(col): _*)
      .agg((sum(col("_trap")).cast("double") / lit(2000.0 * unitSeconds))
        .as("integral"))
  }

  /** rate(f): per-second rate over each group's full span:
    * (last-first)/(t_last-t_first). Reference: `call_processor.go:189`.
    * Selector pairs are `min_by`/`max_by` — a single hash aggregation with
    * map-side partials, no window/sort, so it scales as a plain agg. */
  def rate(df: DataFrame, field: String, time: String,
           tags: Seq[String]): DataFrame = {
    val tus = tMicros(df, time)
    df.groupBy(tags.map(col): _*).agg(
      ((max_by(col(field), col(time)) - min_by(col(field), col(time))) /
        ((max(tus) - min(tus)).cast("double") / 1e6)).as("rate"))
  }

  /** irate(f): instantaneous rate from the last two points of each series
    * (reference: `call_processor.go:189-194`, PromQL irate). One window
    * rank pass bounded to 2 rows per series + a hash agg. */
  def irate(df: DataFrame, field: String, time: String, tags: Seq[String],
            tieBreak: Seq[String] = Nil): DataFrame = {
    val tus = tMicros(df, time)
    val ord = (col(time).desc +: tieBreak.map(col(_).desc))
    val win = Window.partitionBy(tags.map(col): _*).orderBy(ord: _*)
    df.withColumn("_tus", tus)
      .withColumn("_rn", row_number().over(win))
      .filter(col("_rn") <= 2)
      .groupBy(tags.map(col): _*)
      .agg(((max(when(col("_rn") === 1, col(field))) -
             max(when(col("_rn") === 2, col(field)))) /
            ((max(when(col("_rn") === 1, col("_tus"))) -
              max(when(col("_rn") === 2, col("_tus")))) / lit(1000000.0)))
        .as("irate"))
  }

  /** first/last selectors with companion (aux) columns, plus spread.
    * InfluxQL selector semantics keep the timestamp of the selected row:
    * reference `engine/executor/call_processor.go:92-206` + aux rules
    * SURVEY §7.3(b). Implemented as min_by/max_by — one aggregation pass,
    * partial-aggregated before the shuffle. */
  def firstLast(df: DataFrame, field: String, time: String,
                tags: Seq[String]): DataFrame = {
    val tus = tMicros(df, time)
    df.groupBy(tags.map(col): _*).agg(
      min_by(col(field), col(time)).as("first"),
      max_by(col(field), col(time)).as("last"),
      min(tus).as("first_t_us"),
      max(tus).as("last_t_us"),
      (max(col(field)) - min(col(field))).as("spread"),
      count(col(field)).as("n"))
  }

  /** top(f, n) per series — selector keeps whole rows (aux columns).
    * Reference: `call_processor.go:142`, heap `engine/topn_linkedlist.go`.
    *
    * Implemented as a bounded-heap aggregate ([[graft.expressions
    * .TopKRows]]) rather than a window `row_number()`: partial
    * aggregation keeps ≤n rows per series on every map task, so the
    * shuffle carries O(n·series·partitions) rows — a window rank would
    * move the WHOLE table into one partition per series key, which with
    * few distinct keys is a handful of giant tasks at 100 TB. */
  def topPerSeries(df: DataFrame, field: String, time: String,
                   tags: Seq[String], n: Int,
                   bottom: Boolean = false): DataFrame = {
    graft.expressions.TopKRows.register(df.sparkSession)
    val payload = df.columns.toSeq
    val st = struct((Seq(col(field).as("_tk_s0"), col(time).as("_tk_s1")) ++
      payload.map(col)): _*)
    val mask = (if (bottom) "A" else "D") + "A" // field dir, then time asc
    df.groupBy(tags.map(col): _*)
      .agg(call_function("topk_rows", st, lit(n), lit(2), lit(mask))
        .as("_tk_top"))
      .select(posexplode(col("_tk_top")).as(Seq("_tk_pos", "_tk_row")))
      .select(payload.map(c => col(s"_tk_row.$c").as(c)) :+
        (col("_tk_pos") + 1).cast("int").as("rank_in_series"): _*)
  }

  /** Per-series LIMIT n (InfluxQL LIMIT applies per series when grouped):
    * reference `engine/executor/limit_transform.go:88-96`.
    *
    * Earliest offset+n rows per series via the bounded-heap aggregate
    * (all-ascending sort mask) — map-side partials keep ≤ offset+n rows
    * per series per task, so the shuffle never carries the full series
    * (see [[topPerSeries]] for why a window rank would). */
  def limitPerSeries(df: DataFrame, time: String, tags: Seq[String],
                     n: Int, offset: Int = 0,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    graft.expressions.TopKRows.register(df.sparkSession)
    val payload = df.columns.toSeq
    val sortCols = (time +: tieBreak).zipWithIndex
      .map { case (c, i) => col(c).as(s"_tk_s$i") }
    val st = struct((sortCols ++ payload.map(col)): _*)
    df.groupBy(tags.map(col): _*)
      .agg(call_function("topk_rows", st, lit(offset + n),
        lit(sortCols.length), lit("A" * sortCols.length)).as("_tk_top"))
      .select(posexplode(col("_tk_top")).as(Seq("_tk_pos", "_tk_row")))
      .filter(col("_tk_pos") >= offset)
      .select(payload.map(c => col(s"_tk_row.$c").as(c)): _*)
  }

  /** SLIMIT n [SOFFSET m] — limit the number of *series*. Reference:
    * applied in `httpsender_transform.go` / ast.go:2142.
    *
    * Scale shape: the distinct tag sets are ranked with a distributed
    * top-(n+m) (`orderBy.limit` plans as TakeOrderedAndProject — per-
    * partition heaps, no global sort, no single-partition WindowExec even
    * at the reference's 500k-series benchmark scale), the offset is
    * dropped on the now-tiny result, and the selected series are
    * broadcast back as a semi-join. */
  def slimit(df: DataFrame, tags: Seq[String], n: Int,
             soffset: Int = 0): DataFrame = {
    val series = df.select(tags.map(col): _*).distinct()
      .orderBy(tags.map(col): _*)
      .limit(n + soffset)
      .offset(soffset)
    df.join(graft.ExecProfile.maybeBroadcast(series), tags, "left_semi")
  }

  // ------------------------------------------------- chunked lag substrate

  /** Exact integer floor-division (pmod keeps it right for any sign;
    * the DECIMAL hop keeps it exact past double's 2^53 integer range). */
  private def fdiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** Bounded-memory lag-1 for arbitrarily long series.
    *
    * `Window.partitionBy(tags)` puts an ENTIRE series into one task —
    * the right plan when series are bounded (the reference's data model),
    * hostile at 100 TB when one series carries a multi-billion-point
    * history. The chunked substrate adds the time block
    * (`floor(tus / blockMicros)`) to the partition key, so each task
    * holds one (series, block) slice, then stitches block boundaries:
    * the per-block LAST row frame is one row per non-empty (series,
    * block) — orders of magnitude smaller — and a lag over THAT frame
    * (partitioned by series, ordered by block) hands each block the last
    * row of the previous non-empty block, gaps included. Every stage is
    * a shuffle on (tags, block) or the tiny lasts frame; no task ever
    * materializes a whole series.
    *
    * Returns `df` + `_prev_v` / `_prev_tus` / `_tus` (both `_prev_*`
    * null exactly for each series' first point — nullness of `_prev_tus`
    * is the marker, so a legitimately-null previous VALUE round-trips). */
  def chunkedLag(df: DataFrame, field: String, time: String,
                 tags: Seq[String], blockMicros: Long,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    require(blockMicros > 0, "blockMicros must be positive")
    val base = df.withColumn("_tus", tMicros(df, time))
      .withColumn("_blk", fdiv(col("_tus"), blockMicros))
    val part = tags :+ "_blk"
    val wb = Window.partitionBy(part.map(col): _*)
      .orderBy(("_tus" +: tieBreak).map(col): _*)
    val within = base
      .withColumn("_prev_v", lag(col(field), 1).over(wb))
      .withColumn("_prev_tus", lag(col("_tus"), 1).over(wb))
    // last row per non-empty (series, block): max over the lexicographic
    // (tus, tieBreak..., value) struct — tie columns make order total
    // before the value field can influence the comparison
    val ordFields = (col("_tus").as("t") +:
      tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"k$i") }) :+
      col(field).as("v")
    val lasts = base.groupBy(part.map(col): _*)
      .agg(max(struct(ordFields: _*)).as("_last"))
    val wprev = Window.partitionBy(tags.map(col): _*).orderBy(col("_blk"))
    val prevLasts = lasts.select((tags.map(col) :+ col("_blk") :+
      lag(col("_last"), 1).over(wprev).as("_prevlast")): _*)
    val firstRow = col("_prev_tus").isNull
    within.join(prevLasts, part, "left")
      .withColumn("_prev_v",
        when(firstRow, col("_prevlast.v")).otherwise(col("_prev_v")))
      .withColumn("_prev_tus",
        when(firstRow, col("_prevlast.t")).otherwise(col("_prev_tus")))
      .drop("_prevlast", "_blk")
  }

  /** [[difference]] with the chunked substrate — identical output, task
    * memory bounded by `blockMicros` worth of points per series. */
  def differenceChunked(df: DataFrame, field: String, time: String,
                        tags: Seq[String], blockMicros: Long,
                        nonNegative: Boolean = false,
                        tieBreak: Seq[String] = Nil,
                        direction: String = "behind"): DataFrame = {
    val lagged = chunkedLag(df, field, time, tags, blockMicros, tieBreak)
    val out = lagged
      .withColumn("difference",
        diffDirected(col(field) - col("_prev_v"), direction))
      .filter(col("difference").isNotNull)
      .drop("_prev_v", "_prev_tus", "_tus")
    if (nonNegative) out.filter(col("difference") >= 0) else out
  }

  /** [[derivative]] with the chunked substrate — identical output. */
  def derivativeChunked(df: DataFrame, field: String, time: String,
                        tags: Seq[String], blockMicros: Long,
                        unitSeconds: Double = 1.0,
                        tieBreak: Seq[String] = Nil,
                        nonNegative: Boolean = false): DataFrame = {
    val lagged = chunkedLag(df, field, time, tags, blockMicros, tieBreak)
    val dtSec = (col("_tus") - col("_prev_tus")).cast("double") / 1e6
    val out = lagged
      .withColumn("derivative",
        (col(field) - col("_prev_v")) / dtSec * lit(unitSeconds))
      .filter(col("derivative").isNotNull)
      .drop("_prev_v", "_prev_tus", "_tus")
    if (nonNegative) out.filter(col("derivative") >= 0) else out
  }
}
