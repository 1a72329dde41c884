package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row at or
  * before its timestamp, per key: the feature-engineering staple
  * (order→latest-quote, event→last-state) that plain SQL needs a
  * correlated subquery for.
  *
  * Spark-native shape is the UNION + running-window trick, not a range
  * join: tag both sides, sort each key's rows on (time, side) with the
  * right side first at equal timestamps (as-of is inclusive), and carry
  * the right payload forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding running window. One shuffle on the join keys,
  * zero row multiplication — a range join explodes to |L|·|R| pairs
  * per key before pruning, this stays |L|+|R| and spills like any
  * window. Skewed keys salt like any other single-shuffle op.
  *
  * `toleranceMs` nulls matches older than the horizon (pandas
  * merge_asof semantics).
  */
object AsofJoin {

  /** @param on        equi-join key columns (present on both sides)
    * @param leftTime  left timestamp column (TimestampType)
    * @param rightTime right timestamp column (TimestampType)
    * @param rightVals right payload columns to carry (each emitted as
    *                  `asof_<name>`, plus `asof_ts` = matched time)
    * @return left rows + matched right payload (null when no right row
    *         at or before the left time, or outside the tolerance) */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTime: String, rightTime: String,
                   rightVals: Seq[String],
                   toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the right payload travels as ONE struct: last(struct,
    // ignoreNulls) then matches "most recent right ROW", not "most
    // recent non-null value per column" — a right row whose payload
    // column is legitimately NULL must still win (and carry its null),
    // exactly like DuckDB ASOF / pandas merge_asof
    val rvStruct = struct(
      (rightVals.map(col) :+ col(rightTime).as("_rt")): _*)
    val rvType = {
      val tmp = right.select(rvStruct.as("_rv"))
      tmp.schema("_rv").dataType
    }
    // common layout: keys ++ _t ++ _side ++ right struct ++ left payload
    val lPrep = left.select(
      (on.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast(rvType).as("_rv")) ++
        leftCols.filterNot(on.contains)
          .map(c => col(c).as(s"_lv_$c"))): _*)
    val rPrep = right.select(
      (on.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          rvStruct.as("_rv")) ++
        leftCols.filterNot(on.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(s"_lv_$c"))): _*)
    // right sorts before left at equal _t → inclusive as-of
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPrep.unionByName(rPrep)
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val horizon = toleranceMs.map(t =>
      unix_millis(col("_t")) - unix_millis(col("_m._rt")) <= t)
      .getOrElse(lit(true))
    carried.select(
      (on.map(col) ++
        Seq(col("_t").as(leftTime)) ++
        leftCols.filterNot(c => on.contains(c) || c == leftTime)
          .map(c => col(s"_lv_$c").as(c)) ++
        rightVals.map(v =>
          when(horizon, col(s"_m.$v")).as(s"asof_$v")) ++
        Seq(when(horizon, col("_m._rt")).as("asof_ts"))): _*)
  }
}
