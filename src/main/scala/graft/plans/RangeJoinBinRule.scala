package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Injected optimizer rule (`SparkSessionExtensions.injectOptimizerRule`)
  * that rewrites an INNER join whose only cross-side condition on some
  * ordinate is a pure range — `p >= lo AND p <= hi` with `p` from one
  * side and `lo`/`hi` from the other — into the binned equi-join shape of
  * [[graft.ops.RelOps.rangeJoin]]:
  *
  *   - the point side gains `__pbin = floordiv(p, w)`;
  *   - the bound side explodes `__rbin` over `floordiv(lo,w)..floordiv(hi,w)`;
  *   - `__pbin = __rbin` joins the equality path (any extra equi-keys in
  *     the original condition still participate), the original range
  *     predicates remain as the residual filter, and a final Project
  *     restores the original schema.
  *
  * Why a Rule: Spark's planner has no range-join strategy — a pure range
  * condition plans as BroadcastNestedLoopJoin (or a per-key cross product
  * when equi-keys exist but a key is hot). With the ordinate folded into
  * the join key the plan is an ordinary shuffled/broadcast equi-join that
  * AQE can size and skew-split, at the cost of ≤ span/w + 1 copies of each
  * bound-side row. The same transformation Databricks exposes as its
  * range-join hint, here keyed off a session conf.
  *
  * Opt-in: set `spark.graft.rangeJoin.binWidth` (positive long, ordinate
  * units). Unset → the rule is a no-op. The caller picks the width near
  * the typical range span, exactly like calling rangeJoin directly.
  */
class RangeJoinBinRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "")
    if (w.isEmpty) plan
    else w.toLongOption.filter(_ > 0) match {
      case None =>
        // A malformed conf must not take down every query in the session:
        // name the offending key, skip the rewrite.
        logWarning(s"$ConfKey='$w' is not a positive long; " +
          "range-join binning disabled for this plan")
        plan
      case Some(width) =>
        plan.transformUp {
          case j @ Join(l, r, Inner, Some(cond), _) if !alreadyBinned(cond) =>
            tryRewrite(j, l, r, cond, width).getOrElse(j)
        }
    }
  }

  /** Fixed-point guard: the rewritten join carries `__pbin`/`__rbin`. */
  private def alreadyBinned(cond: Expression): Boolean =
    cond.exists {
      case a: AttributeReference => a.name == "__pbin" || a.name == "__rbin"
      case _ => false
    }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case other     => Seq(other)
  }

  /** floordiv(e, w) on a long-cast ordinate: (e − pmod(e, w)) div w, exact
    * for any sign (pmod is the non-negative remainder) and any magnitude —
    * the division is integral, not a double round-trip (doubles are only
    * exact below 2^53; epoch-nanosecond ordinates exceed that). */
  private def binOf(e: Expression, w: Long): Expression = {
    val el = Cast(e, LongType)
    val pm = Pmod(el, Literal(w))
    new IntegralDivide(Subtract(el, pm), Literal(w))
  }

  /** (point, bound, pointOnLeft) for one comparison if it is a cross-side
    * lower/upper range arm on an integral ordinate. */
  private case class Arm(point: Expression, bound: Expression,
                         pointOnLeft: Boolean, lower: Boolean)

  private def armOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Arm] = {
    def side(x: Expression): Option[Boolean] =
      if (x.references.nonEmpty && x.references.subsetOf(l.outputSet)) Some(true)
      else if (x.references.nonEmpty && x.references.subsetOf(r.outputSet)) Some(false)
      else None
    def integral(x: Expression): Boolean = x.dataType match {
      case LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    val norm = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b, true))  // a >= b: b lower-bounds a
      case LessThanOrEqual(a, b)    => Some((a, b, false)) // a <= b: b upper-bounds a
      case _                        => None
    }
    norm.flatMap { case (a, b, bIsLower) =>
      (side(a), side(b)) match {
        case (Some(sa), Some(sb)) if sa != sb && integral(a) && integral(b) =>
          Some(Arm(a, b, pointOnLeft = sa, lower = bIsLower))
        case _ => None
      }
    }
  }

  private def tryRewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                         cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjs = split(cond)
    val arms  = conjs.flatMap(c => armOf(c, l, r))
    // exactly one lower and one upper arm over the SAME point expression,
    // point on the same side in both
    val pair = for {
      lo <- arms.find(_.lower)
      hi <- arms.find(a => !a.lower && a.point.semanticEquals(lo.point) &&
        a.pointOnLeft == lo.pointOnLeft)
    } yield (lo, hi)
    pair.map { case (lo, hi) =>
      val pointOnLeft = lo.pointOnLeft
      val (pointPlan, boundPlan) = if (pointOnLeft) (l, r) else (r, l)
      // point side: one bin column
      val pbinAlias = Alias(binOf(lo.point, w), "__pbin")()
      val pointProj = Project(pointPlan.output :+ pbinAlias, pointPlan)
      // bound side: explode bins overlapped by [lo, hi]
      val rbin = AttributeReference("__rbin", LongType, nullable = false)()
      // Guard inverted/dirty intervals (lo > hi): Sequence with step=1
      // throws on descending boundaries. Clamping the stop to
      // greatest(binLo, binHi) emits ≥1 bin instead; the residual range
      // predicates (p >= lo AND p <= hi, unsatisfiable when lo > hi)
      // already filter every spurious pair.
      val binLo = binOf(lo.bound, w)
      // timeZoneId must be stamped: a TimeZoneAwareExpression with None is
      // never `resolved`, and optimizer plan validation rejects the rewrite.
      val gen = Generate(
        Explode(new Sequence(binLo,
          Greatest(Seq(binLo, binOf(hi.bound, w))),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rbin), child = boundPlan)
      val newCond = (EqualTo(pbinAlias.toAttribute, rbin) +: conjs).reduce(And)
      val (nl, nr) = if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }
}
