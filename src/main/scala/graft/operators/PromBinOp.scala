package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL binary operations between instant-vector series sets —
  * reference `engine/executor/prom_binop_transform.go` (1353 LoC) +
  * transpile `lib/util/lifted/promql2influxql/binary_expr.go`.
  *
  * A series set is (label columns…, value). Vector matching is a join on
  * label columns: `on(...)` restricts the key set, `ignoring(...)` drops
  * from it; unmatched series vanish (PromQL inner-join semantics).
  * Arithmetic produces a value; comparisons filter (keeping the left
  * value); `and`/`unless`/`or` are semi/anti/union-distinct joins — all
  * plain Spark joins that broadcast or shuffle by label key at scale.
  */
object PromBinOp {

  private def matchKeys(labels: Seq[String], on: Option[Seq[String]],
                        ignoring: Seq[String]): Seq[String] =
    on.getOrElse(labels.filterNot(ignoring.contains))

  /** Arithmetic op between two series sets; result labels = match keys. */
  def arith(left: DataFrame, right: DataFrame, op: String,
            labels: Seq[String], on: Option[Seq[String]] = None,
            ignoring: Seq[String] = Nil,
            valueCol: String = "value"): DataFrame = {
    val keys = matchKeys(labels, on, ignoring)
    val l = left.select((keys.map(col) :+ col(valueCol).as("_lv")): _*)
    val r = right.select((keys.map(col) :+ col(valueCol).as("_rv")): _*)
    val v: Column = op match {
      case "+" => col("_lv") + col("_rv")
      case "-" => col("_lv") - col("_rv")
      case "*" => col("_lv") * col("_rv")
      case "/" => col("_lv").cast("double") / col("_rv").cast("double")
      // Prometheus % is Go math.Mod: sign follows the dividend
      case "%" => col("_lv") % col("_rv")
      case "^" => pow(col("_lv"), col("_rv"))
      case "atan2" => atan2(col("_lv").cast("double"),
        col("_rv").cast("double"))
      case other => sys.error(s"unsupported arithmetic op $other")
    }
    l.join(r, keys).withColumn(valueCol, v).drop("_lv", "_rv")
  }

  /** Comparison op: PromQL filter form — keeps left rows (and their value)
    * where the comparison against the matched right value holds. */
  def comparison(left: DataFrame, right: DataFrame, op: String,
                 labels: Seq[String], on: Option[Seq[String]] = None,
                 ignoring: Seq[String] = Nil,
                 valueCol: String = "value"): DataFrame = {
    val keys = matchKeys(labels, on, ignoring)
    val r = right.select((keys.map(col) :+ col(valueCol).as("_rv")): _*)
    val cond: Column = op match {
      case ">" => col(valueCol) > col("_rv")
      case ">=" => col(valueCol) >= col("_rv")
      case "<" => col(valueCol) < col("_rv")
      case "<=" => col(valueCol) <= col("_rv")
      case "==" => col(valueCol) === col("_rv")
      case "!=" => col(valueCol) =!= col("_rv")
      case other => sys.error(s"unsupported comparison $other")
    }
    left.join(r, keys).filter(cond).drop("_rv")
  }

  /** `and`: left series whose label set exists on the right. */
  def and(left: DataFrame, right: DataFrame, labels: Seq[String],
          on: Option[Seq[String]] = None,
          ignoring: Seq[String] = Nil): DataFrame = {
    val keys = matchKeys(labels, on, ignoring)
    left.join(right.select(keys.map(col): _*).distinct(), keys, "left_semi")
  }

  /** `unless`: left series whose label set does NOT exist on the right. */
  def unless(left: DataFrame, right: DataFrame, labels: Seq[String],
             on: Option[Seq[String]] = None,
             ignoring: Seq[String] = Nil): DataFrame = {
    val keys = matchKeys(labels, on, ignoring)
    left.join(right.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }

  /** `or`: all left series plus right series with label sets absent on
    * the left. */
  def or(left: DataFrame, right: DataFrame, labels: Seq[String],
         on: Option[Seq[String]] = None,
         ignoring: Seq[String] = Nil): DataFrame = {
    val keys = matchKeys(labels, on, ignoring)
    left.unionByName(
      right.join(left.select(keys.map(col): _*).distinct(), keys, "left_anti"))
  }
}
