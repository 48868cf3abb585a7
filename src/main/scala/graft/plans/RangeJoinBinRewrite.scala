package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an inner point-in-interval join with NO
  * equi-key — which Spark can only plan as a broadcast nested loop or
  * cartesian product, the classic 100 TB scale-killer — into a binned
  * EQUI-join, automatically and exactly.
  *
  *   SELECT … FROM points p JOIN intervals i
  *   ON p.x >= i.lo AND p.x <= i.hi          -- BNLJ: O(|p|·|i|)
  *
  * becomes (with `spark.graft.rangeJoin.binWidth = w`):
  *
  *   points   + bin  = floor(x / w)                 -- map-side
  *   intervals × bins floor(lo/w) … floor(hi/w)     -- explode
  *   JOIN ON p.bin = i.bin AND p.x >= i.lo AND p.x <= i.hi
  *
  * Exactness: floor is monotone, so lo ≤ x ≤ hi implies floor(lo/w) ≤
  * floor(x/w) ≤ floor(hi/w) — every qualifying pair meets in exactly
  * ONE bin (the point's), and the ORIGINAL range predicate stays on
  * the join, so over-wide bins only cost candidates, never rows. NULL
  * bounds/points produce a NULL bin / empty bin list — zero matches,
  * exactly like the naive plan's three-valued range predicate. This is
  * the same rewrite [[graft.operators.Intervals.pointInIntervalJoin]]
  * applies by hand, surfaced as a `Rule[LogicalPlan]` so EXISTING
  * declarative queries get it without rewriting (SURVEY §7.2's
  * "optional custom Rule" — delivered).
  *
  * Scale contract: one shuffle of each side on the bin key replaces
  * the nested-loop product; interval rows fan out to
  * (hi−lo)/w + 1 bins, so `w` should be of the order of typical
  * interval width (wider w = fewer duplicates, more candidates per
  * bin; AQE's skew split handles hot bins).
  *
  * OPT-IN and deliberately conservative (an optimizer rule must never
  * change results):
  *  - dormant until `spark.graft.rangeJoin.binWidth` is a positive
  *    number (bins in the column's own units; timestamps bin by
  *    seconds);
  *  - inner joins only, exactly one point-between-bounds pattern,
  *    numeric or timestamp types, bounds both from one side and the
  *    point from the other;
  *  - skipped when ANY cross-side equality conjunct exists (the
  *    planner already has a hash key — also what makes the rewrite
  *    idempotent under the fixed-point batch, since the rewritten
  *    join carries a bin equality);
  *  - the rewritten subtree re-derives the ORIGINAL output
  *    attributes, so nothing upstream re-resolves.
  *
  * Register with `spark.experimental.extraOptimizations ++= Seq(
  * RangeJoinBinRewrite)` (runtime) or via
  * [[graft.functions.GraftExtensions]] (`spark.sql.extensions`
  * config, cluster-wide).
  */
object RangeJoinBinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def width: Double =
    try conf.getConfString(ConfKey, "0").toDouble
    catch { case _: NumberFormatException => 0.0 }

  private def binnable(t: DataType): Boolean = t match {
    case _: NumericType | TimestampType => true
    case _ => false
  }

  /** floor(e / w) as a LONG, via one double division — identical
    * arithmetic for the point and both bounds, which is all
    * consistency the proof needs. */
  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    def oneSided(e: Expression) = fromLeft(e) || fromRight(e)

    // a cross-side equality key → the planner already hash-joins;
    // also the idempotency anchor (our own output has a bin equality)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case EqualNullSafe(a, b) => (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (hasEqui) return None

    // normalize every comparison conjunct to (point, bound, isLower).
    // Each inequality admits BOTH readings — a >= b is "a's lower
    // bound is b" and equally "b's upper bound is a" — and only the
    // pairing step can tell which operand is the point, so emit both.
    def asBound(c: Expression): Seq[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(a, b) if oneSided(a) && oneSided(b) =>
        Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) if oneSided(a) && oneSided(b) =>
        Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }
    val bounds = conjuncts.flatMap(asBound(_))
    // find one (point, lo, hi): a lower and an upper bound over the
    // SAME point expression, point and bounds on opposite sides;
    // first match wins, the rest of the condition rides along as-is
    var found: Option[(Expression, Expression, Expression)] = None
    for {
      (p1, lo, isLo) <- bounds if isLo && found.isEmpty
      (p2, hi, isLo2) <- bounds if !isLo2 && found.isEmpty
    } {
      val sameP = p1.semanticEquals(p2)
      val opposite = (fromLeft(p1) && fromRight(lo) && fromRight(hi)) ||
        (fromRight(p1) && fromLeft(lo) && fromLeft(hi))
      if (sameP && opposite && binnable(p1.dataType) &&
        binnable(lo.dataType) && binnable(hi.dataType))
        found = Some((p1, lo, hi))
    }
    val (point, lo, hi) = found.getOrElse(return None)
    val pointOnLeft = fromLeft(point)

    val (pointSide, boundSide) = if (pointOnLeft) (left, right) else (right, left)

    // point side: one bin per row, map-side
    val binAlias = Alias(binOf(point, w), "__graft_bin")()
    val pointProj = Project(pointSide.output :+ binAlias, pointSide)

    // bound side: one row per covered bin. Sequence demands an
    // ascending range; lo > hi (or NULL) yields an empty list — zero
    // matches, same as the naive three-valued predicate.
    val lb = binOf(lo, w)
    val hb = binOf(hi, w)
    // Sequence is TimeZoneAwareExpression: the analyzer's
    // ResolveTimeZone has already run, so set the zone here or the
    // plan flips back to unresolved and the optimizer rejects it.
    val seq = If(
      And(IsNotNull(lb), And(IsNotNull(hb), LessThanOrEqual(lb, hb))),
      Sequence(lb, hb, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val rbinAttr = AttributeReference("__graft_rbin", LongType, nullable = false)()
    val boundGen = Generate(
      Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(rbinAttr), boundSide)

    val (newLeft, newRight) =
      if (pointOnLeft) (pointProj, boundGen) else (boundGen, pointProj)
    val binEq = EqualTo(binAlias.toAttribute, rbinAttr)
    val newJoin = Join(newLeft, newRight, Inner, Some(And(binEq, cond)), hint)
    // restore the original output (drop the helper bin columns)
    Some(Project(j.output, newJoin))
  }
}
