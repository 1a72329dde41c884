package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL range-vector functions — reference `engine/prom_functions.go:30-51`
  * + `engine/executor/prom_range_vector_transform.go`.
  *
  * A range vector at eval step t covers (t−range, t]; evaluation every
  * `step`. Spark-first: `window(ts, range, step)` replicates each point
  * into the range windows it belongs to *before* the partial aggregate —
  * one shuffle, fan-out bounded by range/step, exactly the sliding-window
  * plan. Eval timestamp = window.end.
  *
  * Aggregate set here: count/sum/avg/min/max/last/first _over_time, and
  * the counter/gauge family delta, increase (gauge form), rate (per
  * second over the observed span). changes/resets need in-window ordering
  * → sorted-array fold, kept separate in [[changesResets]].
  */
object PromRange {

  def overTime(df: DataFrame, time: String, value: String,
               labels: Seq[String], range: String, step: String): DataFrame = {
    val tus = unix_micros(col(time))
    val groups = window(col(time), range, step) +: labels.map(col)
    df.groupBy(groups: _*)
      .agg(
        count(col(value)).as("count_ot"),
        sum(col(value).cast("decimal(18,4)")).cast("double").as("sum_ot"),
        min(col(value)).as("min_ot"),
        max(col(value)).as("max_ot"),
        min_by(col(value), tus).as("first_v"),
        max_by(col(value), tus).as("last_v"),
        min(tus).as("first_t_us"),
        max(tus).as("last_t_us"))
      .withColumn("avg_ot",
        col("sum_ot") / col("count_ot"))
      .withColumn("delta", col("last_v") - col("first_v"))
      .withColumn("rate",
        when(col("last_t_us") =!= col("first_t_us"),
          (col("last_v") - col("first_v")) /
            ((col("last_t_us") - col("first_t_us")) / lit(1000000.0))))
      .withColumn("eval_ms", unix_millis(col("window.end")))
      .drop("window")
  }

  /** changes() and resets() — need the in-window time order, computed as a
    * deterministic fold over the sorted sample array. */
  def changesResets(df: DataFrame, time: String, value: String,
                    labels: Seq[String], range: String,
                    step: String): DataFrame = {
    val tus = unix_micros(col(time))
    val groups = window(col(time), range, step) +: labels.map(col)
    val sorted = sort_array(collect_list(struct(tus.as("t"),
      col(value).as("v"))))
    df.groupBy(groups: _*)
      .agg(sorted.as("_pts"))
      .withColumn("changes", aggregate(col("_pts"),
        struct(lit(null).cast("double").as("prev"), lit(0L).as("c")),
        (acc, x) => struct(x.getField("v").as("prev"),
          (acc.getField("c") + when(acc.getField("prev").isNotNull &&
            x.getField("v") =!= acc.getField("prev"), 1L).otherwise(0L)).as("c")),
        acc => acc.getField("c")))
      .withColumn("resets", aggregate(col("_pts"),
        struct(lit(null).cast("double").as("prev"), lit(0L).as("c")),
        (acc, x) => struct(x.getField("v").as("prev"),
          (acc.getField("c") + when(acc.getField("prev").isNotNull &&
            x.getField("v") < acc.getField("prev"), 1L).otherwise(0L)).as("c")),
        acc => acc.getField("c")))
      .withColumn("eval_ms", unix_millis(col("window.end")))
      .drop("window", "_pts")
  }
}
