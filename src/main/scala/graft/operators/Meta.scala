package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SHOW meta queries + row hygiene — reference:
  * statement rewrites `query/statement_rewriter.go` (SHOW → SELECT against
  * meta), blank-row rule `engine/executor/filter_blank_transfrom.go` (e2e
  * `tests/server_test.go:3895`).
  */
object Meta {

  /** Drop rows where every projected field is null — InfluxQL emits no row
    * when all selected fields are blank. */
  def filterBlank(df: DataFrame, fieldCols: Seq[String]): DataFrame =
    df.filter(coalesce(fieldCols.map(col): _*).isNotNull)

  /** SHOW MEASUREMENTS. */
  def showMeasurements(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.ExecProfile.boundedSort(Tables.all.toDF("name"), col("name"))
  }

  /** SHOW SERIES: the distinct tag sets of a measurement. Distinct runs
    * on the raw tag columns (native types, partial-aggregated map-side);
    * the series-key string renders only for the distinct survivors —
    * not once per input row. (Also the more correct order: distinct on
    * raw values cannot be confused by separator characters inside tag
    * values.) */
  def showSeries(df: DataFrame, tags: Seq[String]): DataFrame =
    df.select(tags.map(col): _*).distinct()
      .select(concat_ws(",", tags.map(t =>
        // an absent tag contributes NOTHING (concat_ws skips nulls);
        // `t=` with no value would otherwise leak for null tags
        when(col(t).isNotNull,
          concat(lit(t), lit("="), col(t).cast("string")))): _*)
        .as("series_key"))
      // single-response SHOW contract: profile-following total order
      // (single-task only on the small profile — series cardinality is
      // data-dependent, the scale path keeps the range sort)
      .transform(graft.ExecProfile.boundedSort(_, col("series_key")))

  /** SHOW TAG VALUES WITH KEY = k. */
  def showTagValues(df: DataFrame, tag: String): DataFrame =
    df.select(lit(tag).as("key"), col(tag).cast("string").as("value"))
      .distinct()
      .transform(graft.ExecProfile.boundedSort(_, col("value")))

  /** SHOW FIELD KEYS: field name + type from the schema. */
  def showFieldKeys(df: DataFrame, tags: Seq[String],
                    time: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    // influxql type names and the reference's exact column names
    // (fieldKey/fieldType, types float/integer/string/boolean —
    // server_test.go ShowFieldKeys goldens)
    def influxType(dt: DataType): String = dt match {
      case DoubleType | FloatType => "float"
      case LongType | IntegerType | ShortType | ByteType => "integer"
      case BooleanType => "boolean"
      case StringType => "string"
      case TimestampType => "time"
      case other => other.simpleString
    }
    df.schema.fields
      .filterNot(f => tags.contains(f.name) || time.contains(f.name) ||
        f.name.startsWith("__")) // internal bookkeeping, never a field
      .map(f => (f.name, influxType(f.dataType))).toSeq
      .toDF("fieldKey", "fieldType")
      .transform(graft.ExecProfile.boundedSort(_, col("fieldKey")))
  }

  /** SHOW TAG KEYS. */
  def showTagKeys(spark: SparkSession, tags: Seq[String]): DataFrame = {
    import spark.implicits._
    graft.ExecProfile.boundedSort(tags.toDF("tag_key"), col("tag_key"))
  }

  /** SHOW <object> [EXACT] CARDINALITY — reference grammar
    * `influxql/parser.go:1130-1360` (ShowSeriesCardinality /
    * ShowTagValuesCardinality / …), served there from index sketches.
    * Spark-first: the estimated tier is HLL++ (`approx_count_distinct`) —
    * partial sketches combine map-side and only the fixed-size sketch
    * crosses the shuffle, so at 100 TB no distinct-key set is ever
    * materialized; EXACT pays the count-distinct shuffle it asks for. */
  def valueCardinality(df: DataFrame, c: Column, exact: Boolean): DataFrame =
    df.agg((if (exact) count_distinct(c) else approx_count_distinct(c))
      .cast("long").as("count"))

  /** SHOW SERIES [EXACT] CARDINALITY: distinct tag-set count. */
  def seriesCardinality(df: DataFrame, tags: Seq[String],
                        exact: Boolean): DataFrame =
    valueCardinality(df, concat_ws(",", tags.map(t =>
      concat_ws("=", lit(t), col(t).cast("string"))): _*), exact)
}
