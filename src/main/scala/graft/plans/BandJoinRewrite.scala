package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a band-join theta condition into the
  * bucketized equi-join [[graft.operators.BandJoin]] builds by hand —
  * so a user who writes the natural
  * `l.join(r, keysEqual && abs(l("t") - r("t")) <= band)` gets the
  * scale-correct plan instead of a per-key nested-loop cartesian.
  *
  * Recognized spellings (c a positive foldable numeric literal):
  *   - `abs(x − y) <= c` (or `c >= abs(x − y)`, or strict `<`)
  *   - the two-sided pair a user writes after expanding the abs —
  *     `x >= y − c1 AND x <= y + c2` in any operand order, including
  *     what `BETWEEN y − c1 AND y + c2` parses to. The pair is folded
  *     into one band of width max(|c1|, |c2|); the exact (possibly
  *     asymmetric) predicates are re-applied post-join.
  * with `x` referencing only the left side, `y` only the right
  * (either order).
  *
  * Rewrite (INNER): explode the left with `bucket ∈ {b−m … b+m}` for
  * `b = floor(x/c)`, equi-join on the bucket (plus any existing equi
  * conjuncts, which stay in the join condition), and re-apply the
  * exact band predicate as a post-join filter. Each true pair is
  * produced exactly once — probe buckets are distinct, and the right
  * row's single bucket matches at most one of them.
  *
  * Probe margin m: 1 when both sides bucket via the exact long path
  * (integral column; fractional widths bucket on ceil(c), which keeps
  * the long path exact since coverage only needs bucket ≥ band);
  * 2 when exactly one side goes through double math — `floor(x/c)` in
  * f64 can land one bucket off at an exact boundary (x/c evaluating to
  * 2.9999999999999996); 3 when BOTH sides are double-path, since each
  * errs independently and possibly in opposite directions. The exact
  * post-join band filter removes the extra candidates, so widening
  * costs only fan-out, never correctness.
  *
  * LEFT OUTER (and RIGHT OUTER, mirrored): the probe explosion moves
  * to the *inner* side (right for LeftOuter) so every preserved-side
  * row keeps exactly one bucket — the outer join then emits its
  * matches, or one null-extended row if none. The exact band predicate
  * rides the join condition instead of a post-filter (a post-filter
  * would evaluate to null on the null-extended rows and drop them).
  *
  * The rewritten Join's condition references the `_graft_bkt_*`
  * attributes, which the guard below rejects, so the rule does not
  * re-fire on its own output (fixpoint-safe).
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  /** A recognized band: `lx` on the left plan, `rx` on the right,
    * |lx − rx| ≤ width, and the exact conjunct(s) to re-apply. */
  private case class Band(lx: Expression, rx: Expression, width: Double,
                          exact: Seq[Expression])

  private def numLit(e: Expression): Option[Double] = e match {
    case Literal(v, t)
        if t.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      Some(v.toString.toDouble)
    case _ => None
  }

  /** `abs(x − y) <= c` in its spellings. A fractional bound over
    * integral columns coerces to `cast(abs(x − y) as double) <= c`;
    * the cast is stripped so x, y stay the RAW integral operands —
    * sound because the subtraction happened in exact long space
    * before the cast, so for c < 2^52 (where f64 of the long diff is
    * exact in the match zone) raw |x−y| ≤ ceil(c) for every true
    * match and the exact long bucket path applies. */
  private def asAbsBand(conj: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[Band] = {
    def sides(diff: Expression, bound: Expression): Option[Band] = {
      // Strip ONLY the widening double/float cast Catalyst inserts for
      // a fractional bound over integral operands. A user-written
      // NARROWING cast (e.g. cast(abs(x-y) as int) under non-ANSI mode)
      // can wrap a huge long diff into the band, and stripping it would
      // bucket by the raw diff and silently drop that naive-plan match.
      val stripped = diff match {
        case Cast(inner @ Abs(Subtract(_, _, _), _), t, _, _)
            if t == org.apache.spark.sql.types.DoubleType &&
              numLit(bound).exists(c => c > 0 && c < (1L << 52).toDouble) =>
          inner
        case other => other
      }
      (stripped, numLit(bound)) match {
        case (Abs(Subtract(a, b, _), _), Some(c)) =>
          if (c <= 0) None
          else if (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet))
            Some(Band(a, b, c, Seq(conj)))
          else if (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet))
            Some(Band(b, a, c, Seq(conj)))
          else None
        case _ => None
      }
    }
    conj match {
      case LessThanOrEqual(d, l: Literal) => sides(d, l)
      case GreaterThanOrEqual(l: Literal, d) => sides(d, l)
      case LessThan(d, l: Literal) => sides(d, l) // band still bounds it
      case GreaterThan(l: Literal, d) => sides(d, l)
      case _ => None
    }
  }

  /** Normalize one inequality conjunct to `x − y <= c` with x, y free
    * of literals. Handles `x − y <= c`, `x <= y + c`, `x >= y − c`
    * (≡ y − x <= c) and operand-swapped forms; strict `<`/`>` keep the
    * same bound (the exact conjunct is re-applied anyway). */
  private def asHalf(conj: Expression): Option[(Expression, Expression,
                                                Double)] = {
    // le(a, b): a <= b
    def le(a: Expression, b: Expression): Option[(Expression, Expression,
                                                  Double)] =
      (a, b) match {
        case (Subtract(x, y, _), lit) if numLit(lit).isDefined =>
          Some((x, y, numLit(lit).get)) // x − y <= c
        case (x, Add(y, lit, _)) if numLit(lit).isDefined =>
          Some((x, y, numLit(lit).get)) // x <= y + c
        case (x, Add(lit, y, _)) if numLit(lit).isDefined =>
          Some((x, y, numLit(lit).get)) // x <= c + y
        case (x, Subtract(y, lit, _)) if numLit(lit).isDefined =>
          Some((x, y, -numLit(lit).get)) // x <= y − c
        case (Add(x, lit, _), y) if numLit(lit).isDefined =>
          Some((x, y, -numLit(lit).get)) // x + c <= y → x − y <= −c
        case (Add(lit, x, _), y) if numLit(lit).isDefined =>
          Some((x, y, -numLit(lit).get))
        case (Subtract(x, lit, _), y) if numLit(lit).isDefined =>
          Some((x, y, numLit(lit).get)) // x − c <= y → x − y <= c
        case _ => None
      }
    conj match {
      case LessThanOrEqual(a, b) => le(a, b)
      case LessThan(a, b) => le(a, b)
      case GreaterThanOrEqual(a, b) => le(b, a)
      case GreaterThan(a, b) => le(b, a)
      case _ => None
    }
  }

  /** A pair of half-constraints bounding the same (x, y) diff from
    * both sides → one band. */
  private def asPairBand(conjs: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Option[Band] = {
    val halves = conjs.flatMap(c => asHalf(c).map(h => (c, h)))
    val pairs = for {
      (c1, (x1, y1, hi)) <- halves
      (c2, (x2, y2, lo)) <- halves
      if !(c1 eq c2)
      if x1.semanticEquals(y2) && y1.semanticEquals(x2)
      // diff = x1 − y1 ∈ [−lo, hi]; empty/degenerate bands skipped
      w = math.max(math.abs(hi), math.abs(lo))
      if w > 0 && hi >= -lo
    } yield (c1, c2, x1, y1, w)
    pairs.collectFirst {
      case (c1, c2, x, y, w)
          if x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet) &&
            x.references.nonEmpty && y.references.nonEmpty =>
        Band(x, y, w, Seq(c1, c2))
      case (c1, c2, x, y, w)
          if x.references.subsetOf(right.outputSet) &&
            y.references.subsetOf(left.outputSet) &&
            x.references.nonEmpty && y.references.nonEmpty =>
        Band(y, x, w, Seq(c1, c2))
    }
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** floor(x / d) as LONG. Integral operands use pure long arithmetic —
    * `(x − pmod(x, d)) div d` — because a double round-trip quantizes
    * longs above 2^53 (nanosecond epochs!) and a mis-bucketed row would
    * silently DROP a true match. For a fractional band width the long
    * path buckets on d = ceil(c): bucket coverage only needs the bucket
    * width ≥ the band width, and the exact predicate is re-applied
    * anyway, so rounding the divisor UP is always safe while keeping
    * the arithmetic exact. The double path only serves genuinely
    * floating operands; its boundary error is absorbed by the widened
    * probe margin. BOTH sides must divide by the same d or their
    * buckets are incomparable — the caller decides d jointly. */
  private def bucketOf(x: Expression, d: Double,
                       useLong: Boolean): Expression =
    if (useLong) {
      val cl = Literal(d.toLong)
      val xl = Cast(x, LongType)
      IntegralDivide(Subtract(xl, Pmod(xl, cl)), cl)
    } else
      Cast(Floor(Divide(Cast(x, DoubleType), Literal(d))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), hint)
          if (jt == Inner || jt == LeftOuter || jt == RightOuter) &&
            j.resolved && !cond.exists {
            case a: AttributeReference =>
              a.name.startsWith("_graft_bkt")
            case _ => false
          } =>
        val conjs = splitConj(cond)
        val band = conjs.iterator.flatMap(c => asAbsBand(c, left, right))
          .toSeq.headOption.orElse(asPairBand(conjs, left, right))
        band match {
          case None => j
          case Some(Band(lx, rx, c, exact)) =>
            val rest = conjs.filterNot(cj => exact.exists(_ eq cj))
            // Joint bucket-path decision. dInt = ceil(c) keeps integral
            // sides on exact long math even for fractional widths. The
            // divisor is SHARED: when any side long-paths, the other
            // (if floating) double-paths over the same dInt so the two
            // sides' buckets stay comparable.
            val dInt = math.ceil(c)
            val lLong = isIntegral(lx) && dInt <= Long.MaxValue.toDouble
            val rLong = isIntegral(rx) && dInt <= Long.MaxValue.toDouble
            val d = if (lLong || rLong) dInt else c
            // Probe margin: a true match's REAL bucket gap is ≤1 (the
            // divisor ≥ band width), plus one per side whose f64
            // floor(x/d) can land a bucket off at a boundary. Each
            // double side errs INDEPENDENTLY (possibly in opposite
            // directions), so both-double needs m=3, not 2. Extra
            // candidates are removed by the exact re-applied predicate,
            // so widening costs only fan-out, never correctness.
            val m = (lLong, rLong) match {
              case (true, true) => 1
              case (false, false) => 3
              case _ => 2
            }
            def probesOf(b: Expression) = CreateArray(
              (-m to m).map(i => Add(b, Literal(i.toLong))))
            def explodeSide(side: LogicalPlan, x: Expression,
                            useLong: Boolean, name: String) = {
              val bkt = AttributeReference(name, LongType,
                nullable = true)()
              (Generate(Explode(probesOf(bucketOf(x, d, useLong))), Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(bkt), child = side), bkt)
            }
            def projectSide(side: LogicalPlan, x: Expression,
                            useLong: Boolean, name: String) = {
              val a = Alias(bucketOf(x, d, useLong), name)()
              (Project(side.output :+ a, side), a.toAttribute)
            }
            // the probe explosion goes on the INNER side: under an
            // outer join every preserved-side row must keep exactly
            // one bucket (or it would null-extend once per probe)
            val ((newL, lBkt), (newR, rBkt)) = jt match {
              case LeftOuter =>
                (projectSide(left, lx, lLong, "_graft_bkt_l"),
                  explodeSide(right, rx, rLong, "_graft_bkt_r"))
              case _ =>
                (explodeSide(left, lx, lLong, "_graft_bkt_l"),
                  projectSide(right, rx, rLong, "_graft_bkt_r"))
            }
            val bktEq = EqualTo(lBkt, rBkt).asInstanceOf[Expression]
            jt match {
              case Inner =>
                val joined = Join(newL, newR, Inner,
                  Some((rest :+ bktEq).reduce(And)), hint)
                Project(j.output, Filter(exact.reduce(And), joined))
              case _ =>
                // outer: the exact band rides the join condition (a
                // post-filter would drop the null-extended rows)
                Project(j.output, Join(newL, newR, jt,
                  Some((rest ++ exact :+ bktEq).reduce(And)), hint))
            }
        }
    }
}
