package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaroWinkler.JaroWinklerExpr

/** Optimizer rule: a Jaro–Winkler threshold filter implies a CHEAP
  * length-compatibility conjunct, so add it — the comparator kernel is
  * O(len²)-ish per pair while `length()` is O(1) on UTF8String, and the
  * added conjunct is eligible for further pushdown below joins the
  * opaque `jaro_winkler` call can never cross.
  *
  * Soundness chain (kernel semantics in `JaroWinklerKernel.sim`):
  *  - boost ≤ 0.4·(1−J), so  jw ≥ t  ⇒  J ≥ (t−0.4)/0.6;
  *  - each Jaro term ≤ 1, so J ≥ τ ⇒ m/max ≥ 3τ−2, and m ≤ min, hence
  *    min/max ≥ 5t−4 over the kernel's UTF-16 lengths;
  *  - Spark's `length()` counts CODE POINTS, each 1–2 UTF-16 units, so
  *    the code-point ratio keeps half the bound: minCp ≥ ((5t−4)/2)·maxCp.
  * The literal is `nextDown`-ed so float evaluation can only widen the
  * band — the conjunct is implied by `jw ≥ t` for EVERY string pair
  * (both-empty passes: 0 ≥ r·0). Applies for t ∈ (0.8, 1.0]; below 0.8
  * the bound is vacuous. `semanticEquals` keeps the rewrite idempotent
  * across optimizer iterations. Filter-level only: a threshold living in
  * a Join condition is left alone (the common similarity-join shape
  * filters a projected score, which lands here after pushdown). */
object JaroWinklerLengthPrune extends Rule[LogicalPlan] with PredicateHelper {

  private def ratioFor(t: Double): Option[Double] =
    if (t > 0.8 && t <= 1.0) Some(Math.nextDown((5.0 * t - 4.0) / 2.0))
    else None

  private def thresholdOf(e: Expression): Option[(JaroWinklerExpr, Double)] =
    e match {
      case GreaterThanOrEqual(jw: JaroWinklerExpr, Literal(t: Double, DoubleType)) => Some((jw, t))
      case GreaterThan(jw: JaroWinklerExpr, Literal(t: Double, DoubleType)) => Some((jw, t))
      case LessThanOrEqual(Literal(t: Double, DoubleType), jw: JaroWinklerExpr) => Some((jw, t))
      case LessThan(Literal(t: Double, DoubleType), jw: JaroWinklerExpr) => Some((jw, t))
      case _ => None
    }

  private def lengthConjunct(jw: JaroWinklerExpr, r: Double): Expression = {
    val la = Length(jw.left)
    val lb = Length(jw.right)
    GreaterThanOrEqual(
      Cast(Least(Seq(la, lb)), DoubleType),
      Multiply(Literal(r, DoubleType), Cast(Greatest(Seq(la, lb)), DoubleType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val adds = conjuncts
        .flatMap(thresholdOf)
        .flatMap { case (jw, t) => ratioFor(t).map(lengthConjunct(jw, _)) }
        .filterNot(a => conjuncts.exists(_.semanticEquals(a)))
      if (adds.isEmpty) f else Filter((conjuncts ++ adds).reduce(And), child)
  }
}
