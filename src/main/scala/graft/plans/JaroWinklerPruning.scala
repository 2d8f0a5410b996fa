package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.JaroWinkler

/** Optimizer rule: derive a cheap length-ratio guard for
  * `jaro_winkler(a, b) ≥ t` filters and prepend it, so codegen's
  * left-to-right short-circuit skips the O(|a|·w) comparator on pairs
  * whose lengths already rule them out.
  *
  * Soundness: with m matched chars, s = min(|a|,|b|), L = max(|a|,|b|),
  * m ≤ s gives jaro ≤ (s/s + s/L + 1)/3 = (2 + s/L)/3, and the Winkler
  * bonus is capped: jw ≤ jaro + 0.4·(1 − jaro) = 0.4 + 0.6·jaro. So
  * jw ≥ t  ⟹  s/L ≥ 5t − 4. The guard `s ≥ (5t − 4 − 1e-9)·L` is a
  * NECESSARY condition — the slack keeps float evaluation conservative
  * — so the rewritten filter is bit-identical in output (spec-asserted)
  * while length-skewed candidate pairs never reach the comparator.
  * Vacuous (t ≤ 0.8 ⟹ θ ≤ 0) thresholds are left untouched.
  *
  * Runs in the user-provided batch (fixed-point), so it is idempotent:
  * a guard is only added while no semantically-equal conjunct exists.
  * Exact for BMP text (`length` counts codepoints, the comparator
  * UTF-16 units; they agree on the BMP — the comparator's documented
  * surface).
  */
object JaroWinklerLengthPruning extends Rule[LogicalPlan] {

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  private def guardFor(jw: JaroWinkler, t: Double): Option[Expression] = {
    val theta = 5 * t - 4
    if (theta <= 0) None
    else Some(GreaterThanOrEqual(
      Cast(Least(Seq(Length(jw.left), Length(jw.right))), DoubleType),
      Multiply(Literal(theta - 1e-9),
        Cast(Greatest(Seq(Length(jw.left), Length(jw.right))), DoubleType))))
  }

  /** Guards derivable from `cond` that are not already among its
    * conjuncts (fixed-point idempotence).
    */
  private def newGuards(cond: Expression): Seq[Expression] = {
    val conjuncts = split(cond)
    conjuncts.flatMap {
      case GreaterThanOrEqual(jw: JaroWinkler, Literal(t: Double, DoubleType)) =>
        guardFor(jw, t)
      case GreaterThan(jw: JaroWinkler, Literal(t: Double, DoubleType)) =>
        guardFor(jw, t)
      case LessThanOrEqual(Literal(t: Double, DoubleType), jw: JaroWinkler) =>
        guardFor(jw, t)
      case LessThan(Literal(t: Double, DoubleType), jw: JaroWinkler) =>
        guardFor(jw, t)
      case _ => None
    }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
  }

  // PushDownPredicates runs BEFORE the user batch, so a comparator
  // predicate referencing both join sides has usually become part of
  // the Join condition by the time this rule sees the plan — match both.
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val guards = newGuards(cond)
      if (guards.isEmpty) f
      else Filter(And(guards.reduceLeft(And), cond), child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val guards = newGuards(cond)
      if (guards.isEmpty) j
      else j.copy(condition = Some(And(guards.reduceLeft(And), cond)))
  }
}
