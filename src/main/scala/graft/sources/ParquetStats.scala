package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.column.statistics.LongStatistics
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Table time-extent from parquet footer statistics — no data pass.
  *
  * The reference never scans to learn a table's time range: shard groups
  * carry `{StartTime, EndTime}` in cluster meta (`meta/shardinfo.go:33`)
  * and planning reads that. Parquet keeps the same fact at rest — per
  * row-group min/max column statistics in the file footer — so the
  * equivalent here is a driver-side footer read: O(#files) metadata
  * fetches, independent of data volume. At 100 TB this is the difference
  * between a metadata lookup and a full (if column-pruned) scan per
  * unbounded query.
  */
object ParquetStats {

  /** min/max of an INT64-physical column across all row groups under
    * `path` (a parquet file or directory), plus the ns-per-unit scale
    * implied by the column's logical-type annotation (timestamp[ms/us/ns];
    * a bare INT64 is taken as the engine-native ns epoch). None if the
    * column is absent, not INT64, has no stats, or the table is empty. */
  private def minMaxLongScaled(spark: SparkSession, path: String,
                               column: String): Option[(Long, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val files = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")) match {
      case Nil if fs.getFileStatus(p).isFile => Seq(fs.getFileStatus(p))
      case fsList => fsList
    }
    var lo = Long.MaxValue
    var hi = Long.MinValue
    var seen = false
    var nsPerUnit = 1L
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        if (schema.containsField(column)) {
          schema.getType(Seq(column): _*).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              nsPerUnit = t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000000L
                case LogicalTypeAnnotation.TimeUnit.MICROS => 1000L
                case LogicalTypeAnnotation.TimeUnit.NANOS  => 1L
              }
            case _ => nsPerUnit = 1L // bare INT64: ns epoch (SURVEY §1.2)
          }
        }
        footer.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .foreach { cc =>
              cc.getStatistics match {
                case s: LongStatistics if s.hasNonNullValue =>
                  lo = math.min(lo, s.genericGetMin)
                  hi = math.max(hi, s.genericGetMax)
                  seen = true
                case _ =>
              }
            }
        }
      } finally reader.close()
    }
    if (seen) Some((lo, hi, nsPerUnit)) else None
  }

  /** min/max of an INT64 column across all row groups under `path`,
    * in the column's raw stored unit. */
  def minMaxLong(spark: SparkSession, path: String,
                 column: String): Option[(Long, Long)] =
    minMaxLongScaled(spark, path, column).map { case (lo, hi, _) => (lo, hi) }

  /** Time extent in epoch ms for an INT64-physical timestamp column —
    * unit-adaptive: honors a timestamp[ms/us/ns] logical annotation and
    * treats a bare INT64 as ns (the engine's storage precision,
    * SURVEY §1.2). */
  def timeExtentMs(spark: SparkSession, path: String,
                   column: String = "ts"): Option[(Long, Long)] =
    minMaxLongScaled(spark, path, column).map { case (lo, hi, nsPerUnit) =>
      (Math.floorDiv(Math.multiplyExact(lo, nsPerUnit), 1000000L),
       Math.floorDiv(Math.multiplyExact(hi, nsPerUnit), 1000000L))
    }

  /** Footer time extent for a DataFrame that is — after pruning-only
    * nodes (attribute projections, aliases-of-plan) — ONE plain parquet
    * scan with no data filters; None otherwise. A Filter above the scan
    * disqualifies it (its footer extent could be wider than the visible
    * data, which would change an unbounded query's grid), so the caller
    * can safely `orElse` into a real min/max scan. This is the generic
    * form of the explicit extent wiring: a cold parquet-backed metric
    * never schedules a bounds job just to learn its own time range. */
  def timeExtentMsOf(df: org.apache.spark.sql.DataFrame,
                     column: String): Option[(Long, Long)] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(es, child) if es.forall(_.isInstanceOf[AttributeReference]) =>
        strip(child)
      case SubqueryAlias(_, child) => strip(child)
      case other => other
    }
    strip(df.queryExecution.analyzed) match {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] &&
            fs.location.rootPaths.size == 1 =>
          timeExtentMs(df.sparkSession,
            fs.location.rootPaths.head.toString, column)
        case _ => None
      }
      case _ => None
    }
  }
}
