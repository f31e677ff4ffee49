package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: plan time-proximity joins as banded equi-joins.
  *
  * An inner join whose only cross-side predicate is an interval bound —
  * `abs(l.t - r.t) <= W` on long columns, no equi-key — gives Spark's join
  * selection nothing to hash or sort on, so it falls back to
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons regardless of cluster
  * size, the one join shape that cannot scale. But the interval bound IS
  * an equi-join in disguise: quantize time into width-W bands, and any
  * qualifying pair shares one of the ≤3 bands overlapping the probe row's
  * interval. This rule performs that rewrite on the LOGICAL plan, so users
  * write the natural inequality join and still get a shuffled hash join:
  *
  *   Join(L, R, abs(lt-rt)<=W ∧ rest)
  *     ⇒ Project(origOutput,
  *         Join(Generate(explode(sequence(⌊(lt-W)/W⌋, ⌊(lt+W)/W⌋)), L),
  *              Project(R.* :+ ⌊rt/W⌋ as band, R),
  *              band_probe = band ∧ abs(lt-rt)<=W ∧ rest))
  *
  * Correctness: floor-division is monotone, so rt ∈ [lt-W, lt+W] implies
  * ⌊rt/W⌋ ∈ [⌊(lt-W)/W⌋, ⌊(lt+W)/W⌋] — every qualifying pair survives, the
  * re-applied original bound discards band-mates outside the interval, and
  * each pair appears exactly once (the build side has ONE band per row).
  * NULL times drop on both paths (null condition in the original join;
  * null band key / exploded-null sequence here). Floor division is built
  * as `(t - pmod(t, W)) div W` so pre-1970 (negative) times band correctly
  * — plain `div` truncates toward zero and would misalign bands at the
  * epoch boundary.
  *
  * Conservative scope: inner joins only, no cross-side equi-conjunct
  * (Spark already plans those as hash/sort-merge with a range residual —
  * see `range_join`), the `abs(x - y) <= Literal(Long)` spelling in either
  * operand order, both sides LongType. The rule is idempotent: the
  * rewritten join carries a cross-side equality, so a fixed-point re-run
  * does not fire again. The same rewrite is available as a manual
  * composition in `graft.operators.AsofJoin.bandJoin`; this rule makes the
  * engine apply it to plans users write themselves.
  *
  * Known limitation (like every banded join): the rewrite assumes
  * W ≪ the column's value range. A window on the order of the whole data
  * span lands every row in ~one band, degrading to a single hot key —
  * worse than the nested loop when one side was broadcast-small. Column
  * ranges aren't available at optimization time without CBO histograms,
  * so the rule cannot self-disable; opt out for such a query with
  * spark.sql.optimizer.excludedRules=graft.plans.BandedIntervalJoin.
  */
object BandedIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** abs(x - y) <= w  |  w >= abs(x - y), with long-typed operands. */
  private object ProximityBound {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(w: Long, LongType))
          if w > 0 && x.dataType == LongType && y.dataType == LongType =>
        Some((x, y, w))
      case GreaterThanOrEqual(Literal(w: Long, LongType), Abs(Subtract(x, y, _), _))
          if w > 0 && x.dataType == LongType && y.dataType == LongType =>
        Some((x, y, w))
      case _ => None
    }
  }

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def crossEqui(conjuncts: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (fromSide(a, l) && fromSide(b, r)) || (fromSide(a, r) && fromSide(b, l))
      case EqualNullSafe(a, b) =>
        (fromSide(a, l) && fromSide(b, r)) || (fromSide(a, r) && fromSide(b, l))
      case _ => false
    }

  /** ⌊e/w⌋ as exact integer floor division (sign-correct for negatives).
    *
    * Built WITHOUT a subtract: the naive `(e - pmod(e, w)) div w` wraps
    * below Long.MinValue (or throws under ANSI) for e within w of the long
    * range floor, because pmod is positive there — exactly the sentinel
    * values the band rewrite must survive. `e div w` truncates toward
    * zero, so floor = trunc − 1 when the remainder is negative; neither
    * intermediate can overflow for w > 0 (div shrinks magnitude, and the
    * −1 correction only applies when |div| < |e|).
    */
  private def floorDiv(e: Expression, w: Long): Expression = {
    val lw = Literal(w, LongType)
    Add(
      IntegralDivide(e, lw),
      If(LessThan(Remainder(e, lw), Literal(0L, LongType)),
        Literal(-1L, LongType), Literal(0L, LongType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bound = conjuncts.collectFirst {
        case ProximityBound(x, y, w)
            if (fromSide(x, left) && fromSide(y, right)) ||
              (fromSide(x, right) && fromSide(y, left)) =>
          if (fromSide(x, left)) (x, y, w) else (y, x, w)
      }
      bound match {
        case Some((lt, rt, w)) if !crossEqui(conjuncts, left, right) =>
          // Overflow-safe bounds: lt ± W wraps for values within W of the
          // long range edges (the rule fires on ANY long abs-join — ids
          // and sentinels included, not just timestamps), and a wrapped
          // bound would make Sequence(start > stop, step 1) THROW where
          // the unrewritten nested loop ran fine. Clamping lt into
          // [Min+W, Max−W] before the add/sub only WIDENS the probe range
          // for edge rows (a superset of bands is correct — the original
          // bound re-applies as the residual filter).
          val clampedLo = Subtract(
            Greatest(Seq(lt, Literal(Long.MinValue + w, LongType))),
            Literal(w, LongType))
          val clampedHi = Add(
            Least(Seq(lt, Literal(Long.MaxValue - w, LongType))),
            Literal(w, LongType))
          // Sequence is TimeZoneAwareExpression: without a timezone it
          // reports unresolved and the optimizer's plan-integrity check
          // rejects the rewrite (the tz is irrelevant for long sequences
          // but required for resolution)
          val probeBands = Explode(Sequence(
            floorDiv(clampedLo, w),
            floorDiv(clampedHi, w),
            Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone)))
          val elem = probeBands.elementSchema.head
          val bandProbe =
            AttributeReference("__band_probe", elem.dataType, elem.nullable)()
          val probed = Generate(probeBands, unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(bandProbe), child = left)
          val bandKey = Alias(floorDiv(rt, w), "__band_key")()
          val keyed = Project(right.output :+ bandKey, right)
          val banded = Join(probed, keyed, Inner,
            Some(And(EqualTo(bandProbe, bandKey.toAttribute), cond)), hint)
          Project(j.output, banded)
        case _ => j
      }
  }
}
