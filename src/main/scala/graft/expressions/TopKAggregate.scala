package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over struct rows, with per-field sort
  * directions — the map-side-combinable replacement for the
  * `row_number() OVER (PARTITION BY series)` top-k pattern.
  *
  * The reference's top/bottom selectors keep a fixed-size heap inside the
  * aggregation operator (`engine/executor/top_bottom.go` — a per-group
  * bounded heap merged across inputs), which is exactly the mergeable
  * shape Spark's partial aggregation wants: every map task keeps at most
  * k rows per group, so the shuffle carries O(k · groups · partitions)
  * rows instead of the whole table. A window `row_number()` by contrast
  * shuffles EVERY row into one partition per series key — with few
  * distinct keys (q07: five priorities) that is a handful of giant tasks
  * at 100 TB, the single worst plan shape the engine could pick.
  *
  * Semantics: `child` must be a struct whose first `sortArity` fields are
  * the sort key (compared in order, direction per `desc`, nulls worst);
  * the remaining fields are payload and never compared. `eval` returns the
  * k best rows, best-first, as `array<struct<...>>` — `posexplode` turns
  * the position back into a 1-based rank.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    sortArity: Int,
    desc: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"topk_rows: k must be positive, got $k")
  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  require(desc.length == sortArity,
    s"topk_rows: desc mask length ${desc.length} != sortArity $sortArity")

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_rows"

  @transient private lazy val sortFields = structType.fields.take(sortArity)
  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    sortFields.map(f =>
      TypeUtils.getInterpretedOrdering(f.dataType).asInstanceOf[Ordering[Any]])

  /** compare(a, b) > 0 iff a is BETTER than b. */
  @transient private lazy val goodness: java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] with Serializable {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < sortArity) {
          val dt = sortFields(i).dataType
          val av = if (a.isNullAt(i)) null else a.get(i, dt)
          val bv = if (b.isNullAt(i)) null else b.get(i, dt)
          val c =
            if (av == null && bv == null) 0
            // Spark's default null ordering (asc_nulls_first /
            // desc_nulls_last): on an ASC key a null ranks FIRST (best),
            // on a DESC key it ranks LAST (worst) — matching the
            // window-rank plans this aggregate replaced, so null time or
            // field values select the same rows either way
            else if (av == null) { if (desc(i)) -1 else 1 }
            else if (bv == null) { if (desc(i)) 1 else -1 }
            else {
              val n = fieldOrds(i).compare(av, bv)
              if (desc(i)) n else -n // asc: smaller is better
            }
          if (c != 0) return c
          i += 1
        }
        0
      }
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, goodness) // head = worst

  private def insert(buf: java.util.PriorityQueue[InternalRow],
                     row: InternalRow): Unit = {
    if (buf.size < k) buf.offer(row)
    else if (goodness.compare(row, buf.peek()) > 0) {
      buf.poll(); buf.offer(row)
    }
  }

  // Destructured struct fields, when the child is a literal struct() call
  // (the only way the helpers build it): lets update() evaluate ONLY the
  // sort-key fields for the cheap reject test, and build the full row
  // just for the rare rows that actually enter the heap. With a full
  // heap, almost every input loses to the current worst after one
  // double compare — paying a whole interpreted struct construction per
  // input row there dominated the aggregate's cost.
  @transient private lazy val fieldExprs: Option[Array[Expression]] =
    child match {
      case cns: CreateNamedStruct => Some(cns.valExprs.toArray)
      case _ => None
    }

  /** compare a candidate's evaluated sort-key values against row b. */
  private def compareVals(vals: Array[Any], b: InternalRow): Int = {
    var i = 0
    while (i < sortArity) {
      val bv = if (b.isNullAt(i)) null else b.get(i, sortFields(i).dataType)
      val av = vals(i)
      val c =
        if (av == null && bv == null) 0
        // same direction-aware null rule as `goodness` above
        else if (av == null) { if (desc(i)) -1 else 1 }
        else if (bv == null) { if (desc(i)) 1 else -1 }
        else {
          val n = fieldOrds(i).compare(av, bv)
          if (desc(i)) n else -n
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  override def update(buf: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    fieldExprs match {
      case Some(fes) =>
        // a null PRIMARY sort key means "no rank" — the row is not a
        // candidate (lets callers express "only rows where f exists" by
        // null-ing the key, the same skip rule Spark's max_by applies)
        if (fes(0).eval(input) == null) return buf
        if (buf.size >= k) {
          val sortVals = new Array[Any](sortArity)
          var i = 0
          while (i < sortArity) { sortVals(i) = fes(i).eval(input); i += 1 }
          if (compareVals(sortVals, buf.peek()) <= 0) return buf // reject
          val row = new GenericInternalRow(fes.length)
          i = 0
          while (i < sortArity) { row.update(i, copyValue(sortVals(i))); i += 1 }
          while (i < fes.length) { row.update(i, copyValue(fes(i).eval(input))); i += 1 }
          buf.poll(); buf.offer(row)
        } else {
          val row = new GenericInternalRow(fes.length)
          var i = 0
          while (i < fes.length) { row.update(i, copyValue(fes(i).eval(input))); i += 1 }
          buf.offer(row)
        }
      case None =>
        // InternalRow.copy() on a GenericInternalRow (an interpreted
        // struct producer, e.g. If/CaseWhen over structs from SQL) is
        // SHALLOW — the copied array still points at UTF8String/array
        // buffers the scan recycles. Deep-copy per field, same as the
        // CreateNamedStruct fast path above.
        val v = child.eval(input)
        if (v != null) {
          val r = v.asInstanceOf[InternalRow]
          val n = structType.length
          val row = new GenericInternalRow(n)
          var i = 0
          while (i < n) {
            val fv =
              if (r.isNullAt(i)) null else r.get(i, structType(i).dataType)
            row.update(i, copyValue(fv))
            i += 1
          }
          insert(buf, row)
        }
    }
    buf
  }

  /** Catalyst values read off a reused input row must be copied before
    * they outlive it (UTF8String/struct/array buffers are recycled). */
  private def copyValue(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case other => other
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow],
                     other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next()) // rows are already copies
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, goodness.reversed()) // best first
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  // One projection per operator instance, NOT per serialize() call: the
  // partial aggregate serializes one buffer per (group × partition), and
  // UnsafeProjection.create generates codegen source before it can even
  // consult the compile cache — per-buffer creation cost ~0.5 ms × 46k
  // buffers dwarfed the aggregation itself on the q76 shape.
  @transient private lazy val serProj = UnsafeProjection.create(structType)

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = serProj
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val u = proj(it.next())
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    val nFields = structType.length
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(nFields)
      row.pointTo(b, len)
      buf.offer(row) // ≤ k rows per serialized partial: plain offer keeps all
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)
}

object TopKRows {
  /** Register `topk_rows(struct, k, sortArity, descMask)` in the session
    * registry; descMask is a string like "DA" (D = desc, A = asc), one
    * char per sort field. Idempotent, same pattern as
    * [[VectorExpressions.register]]. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("topk_rows"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_rows", build, "built-in")
  }

  /** Expression builder shared by [[register]] and
    * [[graft.GraftExtensions]]'s injectFunction. */
  def build(exprs: Seq[Expression]): TopKRows = {
    def intLit(e: Expression, what: String): Int = e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"topk_rows: $what must be an integer literal, got $other")
    }
    val k = intLit(exprs(1), "k")
    val arity = intLit(exprs(2), "sortArity")
    val mask = exprs(3).eval().toString.map {
      case 'D' | 'd' => true
      case 'A' | 'a' => false
      case c => throw new IllegalArgumentException(
        s"topk_rows: bad desc-mask char '$c' (want D or A)")
    }
    TopKRows(exprs.head, k, arity, mask)
  }
}
