package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions74

/** Batch-74 invariants: a perfect ranker front-loads the gains chart;
  * the utility gate lands on the hand-computed optimum and prefers
  * the tighter cut on ties.
  */
class Extensions74Spec extends SparkSpec {

  private def scoredOf(rows: (Long, Int)*) = {
    import spark.implicits._
    rows.toSeq.toDF("margin_micro", "label")
  }

  test("x180 planted: a perfect ranker captures everything in the first deciles") {
    // 10 distinct margins, one row each; positives at the top 3
    val rows = (0 until 10).map(i => ((100 - i).toLong * 1000000L,
      if (i < 3) 1 else 0))
    val out = Extensions74.gainsChart(scoredOf(rows: _*),
      "margin_micro", "label").collect()
    assert(out.length == 10)
    assert(out(0).getLong(2) == 1 && out(2).getLong(2) == 1)
    assert(out(2).getDouble(3) == 1.0, "all positives captured by decile 2")
    assert(out(0).getDouble(4) == 10.0 / 3.0 * 3.0 / 10.0 * 10.0 ||
      out(0).getDouble(4) == 3.3333, s"decile-0 lift = (1/1)/(3/10): ${out(0)}")
    assert(out(9).getLong(2) == 0)
  }

  test("x181 planted: the optimum cut is hand-computable; ties keep less") {
    // margins desc: +3 (pos), +2 (neg), +1 (pos), -1 (neg)
    // utilities at cuts: θ=3: 3·1-0=3 ; θ=2: 3-1=2 ; θ=1: 6-1=5 ; θ=-1: 6-2=4
    val out = Extensions74.utilityGate(scoredOf(
      (3000000L, 1), (2000000L, 0), (1000000L, 1), (-1000000L, 0)),
      "margin_micro", "label", benefit = 3L, cost = 1L).collect().head
    assert(out.getLong(0) == 1000000L, s"optimal cut at +1: $out")
    assert(out.getLong(4) == 5L && out.getLong(5) == 4L,
      s"utility 5 beats keep-everything 4: $out")
    // tie case: two rows, both positive -> any cut that keeps both wins;
    // tie between thresholds with equal utility -> highest kept
    val t = Extensions74.utilityGate(scoredOf((2000000L, 1), (1000000L, 0)),
      "margin_micro", "label", benefit = 1L, cost = 1L).collect().head
    assert(t.getLong(0) == 2000000L,
      s"u(θ=2)=1 equals... tie prefers the tighter gate: $t")
  }

  test("x180/x181 fixtures: capture monotone to 1; gate beats or ties base") {
    val gains = SparkEntry.queries("x180_gains_chart")(spark, sf0001)
      .collect()
    val caps = gains.map(_.getDouble(3)).toSeq
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a })
    assert(math.abs(caps.last - 1.0) < 1e-9)
    val gate = SparkEntry.queries("x181_utility_gate")(spark, sf0001)
      .collect().head
    assert(gate.getLong(4) >= gate.getLong(5),
      s"an optimal cut never loses to keep-everything: $gate")
  }
}
