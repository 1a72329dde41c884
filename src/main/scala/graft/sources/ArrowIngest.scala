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

  /** Stream a DataFrame out as Arrow IPC record batches — the DoGet
    * half (`services/arrowflight/service.go:349`: HandleQuery streams
    * the result set back as record batches). Row-batched off
    * `toLocalIterator`, so driver heap is bounded by one partition +
    * one batch regardless of result size; `maxRows` is the same
    * truncation contract as the non-chunked HTTP path. Returns the
    * number of rows written. */
  def writeStream(df: DataFrame, out: java.io.OutputStream,
                  batchRows: Int = 4096,
                  maxRows: Long = Long.MaxValue): Long = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    val sparkFields = df.schema.fields.toSeq
    val arrowFields = sparkFields.map { f =>
      val t = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          new ArrowType.Int(64, true)
        case DoubleType | FloatType =>
          new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case StringType => ArrowType.Utf8.INSTANCE
        case BooleanType => ArrowType.Bool.INSTANCE
        case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND,
          "UTC")
        case _: DecimalType =>
          new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case o => sys.error(s"unsupported column type for arrow: $o")
      }
      new Field(f.name, FieldType.nullable(t), null)
    }
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(
      new ASchema(arrowFields.asJava), alloc)
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      val it = df.toLocalIterator()
      var written = 0L
      while (it.hasNext && written < maxRows) {
        root.allocateNew()
        var n = 0
        while (n < batchRows && it.hasNext && written + n < maxRows) {
          val row = it.next()
          var c = 0
          while (c < sparkFields.length) {
            val v = root.getVector(c)
            if (row.isNullAt(c)) v match {
              case fw: BaseFixedWidthVector => fw.setNull(n)
              case vw: BaseVariableWidthVector => vw.setNull(n)
              case o => sys.error(s"cannot null ${o.getClass}")
            }
            else (v, sparkFields(c).dataType) match {
              case (b: BigIntVector, LongType) =>
                b.setSafe(n, row.getLong(c))
              case (b: BigIntVector, IntegerType) =>
                b.setSafe(n, row.getInt(c).toLong)
              case (b: BigIntVector, ShortType) =>
                b.setSafe(n, row.getShort(c).toLong)
              case (b: BigIntVector, ByteType) =>
                b.setSafe(n, row.getByte(c).toLong)
              case (f8: Float8Vector, DoubleType) =>
                f8.setSafe(n, row.getDouble(c))
              case (f8: Float8Vector, FloatType) =>
                f8.setSafe(n, row.getFloat(c).toDouble)
              case (f8: Float8Vector, _: DecimalType) =>
                f8.setSafe(n, row.getDecimal(c).doubleValue())
              case (s: VarCharVector, StringType) =>
                s.setSafe(n, row.getString(c).getBytes("UTF-8"))
              case (bv: BitVector, BooleanType) =>
                bv.setSafe(n, if (row.getBoolean(c)) 1 else 0)
              case (ts: TimeStampMicroTZVector, TimestampType) =>
                val t = row.getTimestamp(c)
                ts.setSafe(n, t.getTime * 1000L + (t.getNanos / 1000) % 1000)
              case (o, d) =>
                sys.error(s"unsupported vector/type pair: ${o.getClass}/$d")
            }
            c += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        written += n
      }
      writer.end()
      written
    } finally { writer.close(); root.close(); alloc.close() }
  }

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
