package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** InfluxQL-exact `mode(f)`: the most frequent value with the
  * reference's tie rules, which Spark's built-in `mode` (arbitrary /
  * lowest-value ties) cannot reproduce.
  *
  * Reference `engine/executor/agg_func.go:175` (NewModeReduce) sorts the
  * whole slice by value (stable, so time order survives within a value
  * run) and walks runs, with two quirks this replicates exactly:
  *   - a single-occurrence value is only ever CONSIDERED if it is the
  *     first (smallest) value in the slice — later freq-1 runs are
  *     skipped by the loop's reset-then-continue shape, so an all-
  *     distinct column returns its minimum;
  *   - equal frequency ties keep the run whose first occurrence is
  *     EARLIEST in time (later run replaces only when its first time is
  *     <= the incumbent's).
  * Booleans (`NewBooleanModeReduce`, :206): true wins a tie outright.
  *
  * `child` is `struct(v, t_us)`. The buffer is a per-group hash map
  * value → (count, min time) — the same O(distinct-values) memory the
  * reference's whole-slice sort buffers, but mergeable, so partial
  * aggregation combines map-side before the shuffle. */
case class ModeExact(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, (Long, Long)]]
  with UnaryLike[Expression] {

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  private def valueType: DataType = structType.fields(0).dataType

  override def dataType: DataType = valueType
  override def nullable: Boolean = true
  override def prettyName: String = "mode_exact"

  @transient private lazy val valueOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(valueType).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): mutable.HashMap[Any, (Long, Long)] =
    mutable.HashMap.empty

  private def copyValue(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case other => other
  }

  override def update(buf: mutable.HashMap[Any, (Long, Long)],
                      input: InternalRow): mutable.HashMap[Any, (Long, Long)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0)) return buf
    val v = copyValue(row.get(0, valueType))
    val t = if (row.isNullAt(1)) Long.MaxValue else row.getLong(1)
    buf.get(v) match {
      case Some((c, t0)) => buf(v) = (c + 1, math.min(t0, t))
      case None => buf(v) = (1L, t)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, (Long, Long)],
                     other: mutable.HashMap[Any, (Long, Long)]): mutable.HashMap[Any, (Long, Long)] = {
    other.foreach { case (v, (c, t)) =>
      buf.get(v) match {
        case Some((c0, t0)) => buf(v) = (c0 + c, math.min(t0, t))
        case None => buf(v) = (c, t)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, (Long, Long)]): Any = {
    if (buf.isEmpty) return null
    if (valueType == BooleanType) {
      // BooleanModeReduce: true wins ties
      val tf = buf.getOrElse(true, (0L, 0L))._1
      val ff = buf.getOrElse(false, (0L, 0L))._1
      return tf >= ff
    }
    val runs = buf.toSeq.sortBy(_._1)(valueOrd) // ascending value order
    var best: (Any, Long, Long) = null
    runs.zipWithIndex.foreach { case ((v, (f, t)), idx) =>
      val considered = idx == 0 || f >= 2 // freq-1 runs after the first skip
      if (considered && (best == null || f > best._2 ||
          (f == best._2 && t <= best._3)))
        best = (v, f, t)
    }
    best._1
  }

  override def serialize(buf: mutable.HashMap[Any, (Long, Long)]): Array[Byte] = {
    val proj = serProj
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val rowBuf = new GenericInternalRow(3)
    buf.foreach { case (v, (c, t)) =>
      rowBuf.update(0, v)
      rowBuf.update(1, c)
      rowBuf.update(2, t)
      val bytes = proj(rowBuf).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  @transient private lazy val serSchema =
    StructType(Seq(StructField("v", valueType), StructField("c", LongType),
      StructField("t", LongType)))
  @transient private lazy val serProj = UnsafeProjection.create(serSchema)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(3)
      row.pointTo(b, len)
      buf(copyValue(row.get(0, valueType))) = (row.getLong(1), row.getLong(2))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ModeExact =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ModeExact =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ModeExact =
    copy(child = newChild)
}

object ModeExact {
  /** Register `mode_exact(struct(v, t_us))`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("mode_exact"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mode_exact", build, "built-in")
  }

  def build(exprs: Seq[Expression]): ModeExact = {
    require(exprs.length == 1, "mode_exact takes struct(v, t_us)")
    ModeExact(exprs.head)
  }
}
