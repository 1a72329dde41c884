package graft.sources

import java.io.ByteArrayInputStream
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow ingest — the reference's Arrow Flight `DoPut` write surface
  * (`services/arrowflight/service.go:291`: a JSON descriptor
  * `{db, rp, mst}` plus a stream of record batches appended to the
  * measurement, write-privilege checked on the database).
  *
  * Transport divergence, documented: the Flight wire protocol is gRPC,
  * and Spark's jar set ships `arrow-vector`/`arrow-memory` but no
  * `flight-core`/gRPC — so the gateway accepts the SAME payload (an
  * Arrow IPC stream of record batches) over `POST /api/v1/arrow/doput`
  * with the descriptor's fields as query params. Everything after the
  * transport is the reference's contract: per-batch append, tags from
  * utf8 columns, fields from numeric/bool columns, `time` the
  * nanosecond time column.
  *
  * Column mapping (`record_writer.go` schema rules, re-expressed):
  *  - `time`: int64 epoch NANOS or any Arrow timestamp → the `ts`
  *    timestamp column (µs, the engine's storage view);
  *  - utf8 columns → tag columns (string);
  *  - int/float/bool columns → fields (long / double / boolean).
  */
object ArrowIngest {

  /** Decode one IPC stream into (frame with `ts`, tag column names).
    * Row-materializes on the driver — this is the serving veneer's
    * ingest path, same as line protocol; the persisted parquet is what
    * queries scan. */
  def decode(spark: SparkSession, body: Array[Byte])
      : (DataFrame, Seq[String]) = {
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(body), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.toSeq
      require(fields.exists(_.getName == "time"),
        "arrow do-put schema needs a 'time' column")
      val sparkFields = fields.map { f =>
        val name = f.getName
        f.getType match {
          case _ if name == "time" => StructField("ts", TimestampType)
          case t: org.apache.arrow.vector.types.pojo.ArrowType.Int =>
            StructField(name, LongType)
          case _: org.apache.arrow.vector.types.pojo.ArrowType.FloatingPoint =>
            StructField(name, DoubleType)
          case _: org.apache.arrow.vector.types.pojo.ArrowType.Utf8 =>
            StructField(name, StringType)
          case _: org.apache.arrow.vector.types.pojo.ArrowType.Bool =>
            StructField(name, BooleanType)
          case _: org.apache.arrow.vector.types.pojo.ArrowType.Timestamp =>
            StructField(name, TimestampType)
          case t => sys.error(s"unsupported arrow type for $name: $t")
        }
      }
      val tags = sparkFields.collect {
        case StructField(n, StringType, _, _) => n
      }
      val rows = Vector.newBuilder[Row]
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        var i = 0
        while (i < n) {
          rows += Row.fromSeq(fields.indices.map { c =>
            val v = root.getVector(c)
            if (v.isNull(i)) null
            else v match {
              case ts: TimeStampNanoVector =>
                java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                  Math.floorDiv(ts.get(i), 1000000000L),
                  Math.floorMod(ts.get(i), 1000000000L)))
              case ts: TimeStampMicroVector =>
                java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                  Math.floorDiv(ts.get(i), 1000000L),
                  Math.floorMod(ts.get(i), 1000000L) * 1000L))
              case ts: TimeStampMilliVector =>
                new java.sql.Timestamp(ts.get(i))
              case b: BigIntVector =>
                if (fields(c).getName == "time")
                  // int64 time = epoch nanos (the reference's storage
                  // precision)
                  java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                    Math.floorDiv(b.get(i), 1000000000L),
                    Math.floorMod(b.get(i), 1000000000L)))
                else java.lang.Long.valueOf(b.get(i))
              case iv: IntVector => java.lang.Long.valueOf(iv.get(i).toLong)
              case f8: Float8Vector => java.lang.Double.valueOf(f8.get(i))
              case f4: Float4Vector =>
                java.lang.Double.valueOf(f4.get(i).toDouble)
              case s: VarCharVector => new String(s.get(i), "UTF-8")
              case bv: BitVector => java.lang.Boolean.valueOf(bv.get(i) != 0)
              case o => sys.error(s"unsupported arrow vector: ${o.getClass}")
            }
          })
          i += 1
        }
      }
      val materialized = rows.result()
      require(materialized.nonEmpty, "no rows in arrow stream")
      val df = spark.createDataFrame(materialized.asJava,
        StructType(sparkFields))
      (df, tags)
    } finally { reader.close(); alloc.close() }
  }
}
