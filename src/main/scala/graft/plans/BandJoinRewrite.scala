package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a band-join theta condition into the
  * bucketized equi-join [[graft.operators.BandJoin]] builds by hand —
  * so a user who writes the natural
  * `l.join(r, keysEqual && abs(l("t") - r("t")) <= band)` gets the
  * scale-correct plan instead of a per-key nested-loop cartesian.
  *
  * Pattern: an INNER join whose condition contains a conjunct
  * `abs(x − y) <= c` (or `c >= abs(x − y)`) with `x` referencing only
  * the left side, `y` only the right (either order), `c` a positive
  * foldable literal. Rewrite: explode the left with
  * `bucket ∈ {b−1, b, b+1}` for `b = floor(x/c)`, equi-join on the
  * bucket (plus any existing equi conjuncts, which stay in the join
  * condition), and re-apply the exact band predicate as a post-join
  * filter. Each true pair is produced exactly once — the three probe
  * buckets are distinct, and the right row's bucket matches one of
  * them iff |x−y| could be ≤ c.
  *
  * The rewritten Join's condition carries no band conjunct, so the
  * rule does not re-fire on its own output (fixpoint-safe).
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  /** (leftExpr, rightExpr, band) when `conj` is a band predicate over
    * exactly the two join sides. */
  private def asBand(conj: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[(Expression, Expression,
                                                  Double)] = {
    def sides(diff: Expression,
              bound: Expression): Option[(Expression, Expression, Double)] =
      (diff, bound) match {
        case (Abs(Subtract(a, b, _), _), Literal(v, t))
            if t.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
          val c = v.toString.toDouble
          if (c <= 0) None
          else if (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) Some((a, b, c))
          else if (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet)) Some((b, a, c))
          else None
        case _ => None
      }
    conj match {
      case LessThanOrEqual(d, l: Literal) => sides(d, l)
      case GreaterThanOrEqual(l: Literal, d) => sides(d, l)
      case LessThan(d, l: Literal) => sides(d, l) // band still bounds it
      case _ => None
    }
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** floor(x / c) as LONG. Integral operands with an integral band use
    * pure long arithmetic — `(x − pmod(x, c)) div c` — because a
    * double round-trip quantizes longs above 2^53 (nanosecond epochs!)
    * and a mis-bucketed row would silently DROP a true match. The
    * double path only serves genuinely-floating operands, which carry
    * no more precision than the double bucket math itself. */
  private def bucketOf(x: Expression, c: Double): Expression =
    if (isIntegral(x) && c == math.floor(c) && c <= Long.MaxValue.toDouble) {
      val cl = Literal(c.toLong)
      val xl = Cast(x, LongType)
      IntegralDivide(Subtract(xl, Pmod(xl, cl)), cl)
    } else
      Cast(Floor(Divide(Cast(x, DoubleType), Literal(c))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !cond.exists {
            case a: AttributeReference =>
              a.name.startsWith("_graft_bkt")
            case _ => false
          } =>
        val conjs = splitConj(cond)
        conjs.iterator.flatMap(c =>
          asBand(c, left, right).map(c -> _)).toSeq.headOption match {
          case None => j
          case Some((bandConj, (lx, rx, c))) =>
            val rest = conjs.filterNot(_ eq bandConj)
            val lb = bucketOf(lx, c)
            val probes = CreateArray(Seq(
              Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))
            val lBkt = AttributeReference("_graft_bkt_l", LongType,
              nullable = true)()
            val genL = Generate(Explode(probes), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(lBkt), child = left)
            val rAlias = Alias(bucketOf(rx, c), "_graft_bkt_r")()
            val projR = Project(right.output :+ rAlias, right)
            val newCond = (rest :+
              EqualTo(lBkt, rAlias.toAttribute).asInstanceOf[Expression])
              .reduce(And)
            val joined = Join(genL, projR, Inner, Some(newCond), hint)
            Project(j.output, Filter(bandConj, joined))
        }
    }
}
