package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join — pair left and right rows on equal keys whose
  * timestamps lie within ±band of each other: the "events near events"
  * primitive (error↔click correlation, trade↔quote windows).
  *
  * The naive plan is an inequality theta-join — Spark executes it as a
  * per-key cartesian (BroadcastNestedLoop / CartesianProduct) that
  * explodes at |L|·|R| per key. The scale-correct shape BUCKETIZES
  * time at the band width: a right row at bucket b can only band-match
  * left rows in buckets {b-1, b, b+1}, so the left side explodes ×3
  * onto (key, bucket) and the join is a plain equi-join with a final
  * exact |Δt| ≤ band filter. Fan-out is bounded by true match density
  * (each candidate pair is generated exactly once — the right row's
  * own bucket is joined from exactly one of the left's three probes),
  * and the plan stays hash/sort-merge — BandJoinSpec asserts no
  * nested-loop operator survives.
  */
object BandJoin {

  /** @return every (left ⨯ right) pair with equal `on` keys and
    *         |leftTime − rightTime| ≤ bandMs; left columns keep their
    *         names, right columns are prefixed `r_` */
  def bandJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTime: String, rightTime: String,
               bandMs: Long): DataFrame = {
    require(bandMs > 0, "band must be positive")
    val lms = unix_millis(col(leftTime))
    val rms = unix_millis(col(s"r_$rightTime"))
    val rPref = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val probes = left.withColumn("_lb",
        floor(lms / bandMs).cast("long"))
      .withColumn("_bkt", explode(array(col("_lb") - 1, col("_lb"),
        col("_lb") + 1)))
      .drop("_lb")
    val rBkt = rPref.withColumn("_rbkt",
      floor(rms / bandMs).cast("long"))
    val cond = on.map(k => col(k) === col(s"r_$k"))
      .reduce(_ && _) && col("_bkt") === col("_rbkt")
    probes.join(rBkt, cond)
      .filter(abs(lms - rms) <= bandMs)
      .drop("_bkt").drop("_rbkt")
      .drop(on.map(k => s"r_$k"): _*)
  }
}
