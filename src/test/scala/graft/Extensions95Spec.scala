package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions95

/** Batch-95 invariants: the rebalance plan prescribes the exact
  * epoch factors (capped, dropped, untouched); the truncation card
  * counts lost tokens exactly.
  */
class Extensions95Spec extends SparkSpec {

  test("x218 planted: equal-share source at its own share reads factor 1; starved source caps; untargeted drops") {
    import spark.implicits._
    // 100 docs: a=50, b=40, c=10. Targets: a 500‰ (factor 1), b 0
    // (drop), c 500‰ (5x -> caps at 3)
    val df = ((1 to 50).map(_ => "a") ++ (1 to 40).map(_ => "b") ++
      (1 to 10).map(_ => "c")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "source")
    val out = Extensions95.mixtureRebalancePlan(df, "source",
        Map("a" -> 500L, "c" -> 500L), maxEpochs = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(4) == 1.0 && !out("a").getBoolean(5))
    assert(out("b").getDouble(4) == 0.0 && out("b").getDouble(3) == 0.0)
    assert(out("c").getDouble(4) == 3.0 && out("c").getBoolean(5),
      s"5x demand must cap at 3: ${out("c")}")
  }

  test("x219 planted: exact lost-token arithmetic at each candidate ctx") {
    import spark.implicits._
    // three docs of 10, 20, 40 tokens
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc(10)), (2L, doc(20)), (3L, doc(40))).toDF("id", "text")
    val out = Extensions95.truncationLossCard(df, "text", Seq(15, 25, 50))
      .collect().map(r => r.getLong(0) -> r).toMap
    // ctx 15: docs 20,40 truncate; lost = 5 + 25 = 30 of 70
    assert(out(15L).getLong(2) == 2L && out(15L).getLong(4) == 30L)
    assert(out(15L).getDouble(5) == 0.4286)
    // ctx 25: only the 40-doc truncates; lost 15
    assert(out(25L).getLong(2) == 1L && out(25L).getLong(4) == 15L)
    // ctx 50: nothing truncates
    assert(out(50L).getLong(2) == 0L && out(50L).getLong(4) == 0L &&
      out(50L).getDouble(5) == 0.0)
  }
}
