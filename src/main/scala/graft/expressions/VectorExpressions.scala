package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Native dot product over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns.
  *
  * The composable form (`zip_with` + `aggregate` fold, Similarity.dot)
  * materializes an intermediate array and evaluates a lambda per element
  * per row; ANN scoring evaluates O(|Q|·|C|·dim) of those. This expression
  * generates a primitive fused multiply-add loop instead — the SURVEY §7.3
  * "custom Expression where built-ins can't express it *efficiently*" case.
  *
  * Summation order is the same sequential left fold as the composable
  * form, so results are bit-identical and the DuckDB oracle still
  * hash-matches.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: several vec_dot calls can land in one (block-less)
      // projection; fixed identifiers would collide and break Janino.
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) { $s += $lGet * $rGet; }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index of the nearest codebook centroid by squared L2 (ties → lowest
  * index) — the IVF cell-assignment hot path, `n_corpus × k × dim` work.
  *
  * `right` must be a FOLDABLE `array<array<double>>` literal (the trained
  * codebook); it is decoded ONCE into a primitive `double[][]` that ships
  * to executors as a codegen reference object. That keeps the expression
  * tree at O(1) nodes AND the whole projection inside whole-stage codegen
  * for any cell count — per-centroid distance columns put k × dim literal
  * payloads in the tree (analysis/codegen ceiling ≈ k=256), and
  * higher-order-function forms are CodegenFallback, dropping the project
  * out of codegen entirely.
  *
  * The distance fold is the same sequential `(x_d − c_d)²` left fold as
  * the composable zip_with+aggregate form, so assignments are
  * bit-identical to it (and to driver-side replications in tests).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val rightOk = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (!(leftOk && rightOk))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "vec_nearest_centroid expects (array<float|double>, " +
          s"foldable array<array<double>>), got ${left.dataType}, ${right.dataType}")
    else {
      // The codebook is foldable — evaluate it HERE so a null literal, a
      // null centroid row, or a null element fails analysis with a message
      // naming the function instead of NPE-ing at first row evaluation.
      val cb = right.eval(null)
      if (cb == null)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "vec_nearest_centroid: codebook literal is null")
      else {
        val ad = cb.asInstanceOf[ArrayData]
        val badRow = (0 until ad.numElements()).find { i =>
          ad.isNullAt(i) || {
            val row = ad.getArray(i)
            (0 until row.numElements()).exists(row.isNullAt)
          }
        }
        badRow match {
          case Some(i) =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"vec_nearest_centroid: codebook row $i is null or contains nulls")
          case None =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        }
      }
    }
  }

  /** The codebook, decoded once per expression instance (driver AND each
    * executor after the expression deserializes — not per row). */
  private lazy val matrix: Array[Array[Double]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private def nearest(x: ArrayData): Int = {
    var best = 0; var bd = Double.PositiveInfinity
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val n = math.min(x.numElements(), cent.length)
      var s = 0.0; var d = 0
      while (d < n) {
        val xv = if (elemIsFloat) x.getFloat(d).toDouble else x.getDouble(d)
        val t = xv - cent(d)
        s += t * t
        d += 1
      }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(a: Any, ignoredCodebook: Any): Any =
    nearest(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val m = ctx.addReferenceObj("codebook", matrix, "double[][]")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val get = if (elemIsFloat) s"(double) $a.getFloat($d)"
                else s"$a.getDouble($d)"
      s"""
        int $best = 0; double $bd = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $m.length; $c++) {
          int $n = java.lang.Math.min($a.numElements(), $m[$c].length);
          double $s = 0.0;
          for (int $d = 0; $d < $n; $d++) {
            double $t = $get - $m[$c][$d];
            $s += $t * $t;
          }
          if ($s < $bd) { $bd = $s; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) lookup fold for PQ scoring:
  * `Σ_i tables[i][codes[i]]` over an `ARRAY<INT>` code word (one small int
  * per subspace, per candidate row) and the query's per-subspace distance
  * tables (`ARRAY<ARRAY<DOUBLE>>`, one row per query — NOT foldable, so
  * this cannot reuse NearestCentroid's reference-object trick).
  *
  * The composable form (`aggregate(zip_with(codes, tables, (c, t) =>
  * element_at(t, c + 1)), …)`) evaluates interpreted lambdas per candidate
  * — higher-order functions are CodegenFallback, so the probe join's
  * scoring projection dropped out of whole-stage codegen exactly where the
  * engine evaluates O(candidates) work. This expression is a primitive
  * lookup loop inside codegen. Fold order matches the composable form
  * bit-for-bit on valid codes; an out-of-range code yields NULL (a
  * malformed candidate drops from the ranking) where ANSI element_at
  * would instead fail the whole query — codes from [[graft.pipeline
  * .Similarity.pqEncode]] are always in range, so the divergence is
  * unreachable from the operator surface.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }
    val tablesOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && tablesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int>, array<array<double>>), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tables = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), tables.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val t = tables.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= t.numElements()) return null
      s += t.getDouble(c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          org.apache.spark.sql.catalyst.util.ArrayData $t = $b.getArray($i);
          int $c = $a.getInt($i);
          if ($c < 0 || $c >= $t.numElements()) { ${ev.isNull} = true; break; }
          $s += $t.getDouble($c);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single-pass 64-bit SimHash over a token array.
  *
  * The composable form evaluated 64 separate interpreted `aggregate()`
  * higher-order folds per row (one per bit position) over
  * `transform(tokens, xxhash64)` — 65 interpreted passes over every
  * document's tokens, CodegenFallback throughout; q29 cost 1.33 s at
  * sf0.01 once honestly materialized. This expression makes ONE pass:
  * each token is hashed with Spark's own XxHash64 (seed 42, identical
  * to the `xxhash64()` function, so `tools/oracle.py`'s pure-python
  * replication still matches bit-for-bit) and votes all 64 bit counters
  * in a tight JVM loop; bits with positive votes set the output bit.
  * A null token contributes the unchanged seed, exactly like
  * `xxhash64(NULL)`.
  *
  * Reference semantics: SimHash (Charikar '02) as used by the dedup
  * pipelines; openGemini has no simhash — this is a training-data
  * curation addition.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    SimHashUtil.hash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All capture groups of ONE regex match as `array<string>` — the
  * UNNEST(match_all) hot path ran one full `regexp_extract` (pattern
  * match + group pick) PER declared column; this runs the matcher once
  * and returns every group. Semantics per group are exactly
  * `regexp_extract`'s: `find()` anchoring, empty string when the regex
  * misses or the group didn't participate. The pattern must be a
  * foldable string; it compiles once into a codegen reference object.
  *
  * Reference: `engine/immutable/unnest_func.go:103-115` evaluates the
  * regex once per row and fans groups out to columns — this expression
  * is that exact shape.
  */
case class RegexpGroups(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType &&
        right.foldable && right.eval(null) != null)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"regexp_groups expects (string, foldable non-null string pattern), " +
        s"got ${left.dataType}, ${right.dataType}")

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(right.eval(null).toString)

  override def nullSafeEval(s: Any, ignoredPattern: Any): Any =
    RegexUtil.groups(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pattern", pattern, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expressions.RegexUtil.groups($a, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RegexUtil {
  def groups(s: org.apache.spark.unsafe.types.UTF8String,
             p: java.util.regex.Pattern)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = p.matcher(s.toString)
    val n = m.groupCount()
    val out = new Array[Any](n)
    if (m.find()) {
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        out(i) =
          if (g == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
          else org.apache.spark.unsafe.types.UTF8String.fromString(g)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        out(i) = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Σ over a token array of `lookup(token)`, with misses scored as
  * `numChars(token) + 1` — the BPE-apply fold (subword count per doc).
  *
  * The composable form folded `element_at(typedLit(vocabMap), w)` over
  * the tokens: element_at on a MAP LITERAL is a LINEAR SCAN of
  * ArrayBasedMapData, so the apply cost was tokens × |vocab| (the
  * honest ×100 sweep measured 58 s where ~5 s of real work exists).
  * Here the foldable map child is decoded ONCE into a hashed reference
  * object — O(1) per token, one pass, single codegen call.
  *
  * `right` must be a foldable map<string,int> (the word → |subwords|
  * table; vocab-bounded by construction). */
case class TokenScoreSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val rightOk = right.foldable && (right.dataType match {
      case org.apache.spark.sql.types.MapType(StringType,
        org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (leftOk && rightOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_score_sum expects (array<string>, foldable map<string,int>), " +
        s"got ${left.dataType}, ${right.dataType}")
  }

  /** The lookup table, decoded once per expression instance (driver AND
    * each executor after deserialization — not per row). */
  @transient private lazy val table
      : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        Integer] = {
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Integer]()
    val md = right.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val ks = md.keyArray(); val vs = md.valueArray()
    var i = 0
    while (i < md.numElements()) {
      m.put(ks.getUTF8String(i).clone(), Integer.valueOf(vs.getInt(i)))
      i += 1
    }
    m
  }

  override def nullSafeEval(tokens: Any, ignoredMap: Any): Any =
    TokenScoreUtil.sum(tokens.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("tokenTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expressions.TokenScoreUtil.sum($a, $t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenScoreUtil {
  def sum(tokens: ArrayData,
          table: java.util.HashMap[
            org.apache.spark.unsafe.types.UTF8String, Integer]): Long = {
    var acc = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val v = table.get(w)
      acc += (if (v != null) v.longValue() else w.numChars().toLong + 1L)
      i += 1
    }
    acc
  }
}

/** Static helper so the codegen body is one call (object methods get
  * static forwarders, directly callable from generated Java). */
object SimHashUtil {
  private final val Seed = 42L // xxhash64()'s fixed seed

  def hash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (tokens.isNullAt(i)) Seed
        else XxHash64Function.hash(tokens.getUTF8String(i), StringType, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object VectorExpressions {
  /** Register `vec_dot` / `vec_nearest_centroid` in the session function
    * registry (idempotent — an already-registered name is left alone, so
    * repeated calls from per-query operator entry points do not emit the
    * registry's "replaced a previously registered function" WARN per
    * call; hundreds of those crowded the driver's bounded stderr tail)
    * so they are reachable from both `call_function` and SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(
          "vec_nearest_centroid")))
      reg.createOrReplaceTempFunction(
        "vec_nearest_centroid",
        exprs => NearestCentroid(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("pq_adc")))
      reg.createOrReplaceTempFunction(
        "pq_adc", exprs => PqAdc(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64")))
      reg.createOrReplaceTempFunction(
        "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("regexp_groups")))
      reg.createOrReplaceTempFunction(
        "regexp_groups", exprs => RegexpGroups(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("token_score_sum")))
      reg.createOrReplaceTempFunction(
        "token_score_sum",
        exprs => TokenScoreSum(exprs(0), exprs(1)), "built-in")
  }
}
