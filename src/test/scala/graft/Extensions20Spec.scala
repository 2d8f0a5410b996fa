package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions20

/** Batch-20 invariants beyond the value-level oracles. */
class Extensions20Spec extends SparkSpec {

  test("x79 waterfill: allocations sum to the budget and truncate at one level") {
    val rows = SparkEntry.queries("x79_waterfill_budget")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("budget"), r.getAs[Double]("alloc_tokens")))
    val budget = rows.head._3.toDouble
    val allocSum = rows.map(_._4).sum
    // exact waterfill: Σ min(n_i, cap) = B, up to 4dp rounding per source
    assert(math.abs(allocSum - budget) < rows.length * 1e-3,
      s"allocations sum to $allocSum, budget $budget")
    val truncated = rows.filter(r => r._4 < r._2)
    val full = rows.filter(r => r._4 == r._2.toDouble)
    assert(truncated.nonEmpty && full.nonEmpty, "both branches must be exercised")
    // every truncated source sits at the SAME water level
    assert(truncated.map(_._4).distinct.length == 1,
      s"truncated sources must share one cap: ${truncated.map(_._4).distinct.toSeq}")
    // the level exceeds every fully-granted source's mass
    val cap = truncated.head._4
    assert(full.forall(_._2 <= cap), "full grants must sit below the water level")
  }

  test("x79 a budget covering the corpus grants every source in full") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = Extensions20.waterfillBudget(d, "source", "text", budgetFrac = 1.5)
      .collect().map(r => r.getAs[Long]("n_tokens").toDouble ->
        r.getAs[Double]("alloc_tokens"))
    assert(rows.forall { case (n, a) => a == n },
      "cap must be infinite when the budget exceeds the corpus")
  }

  test("x81 packing curve: token mass is conserved and fill degrades with context") {
    val rows = SparkEntry.queries("x81_packing_curve")(spark, sf0001)
      .orderBy(col("ctx")).collect()
      .map(r => (r.getAs[Long]("ctx"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("sum_tokens"), r.getAs[Double]("fill_frac")))
    assert(rows.map(_._3).distinct.length == 1,
      "every context length packs the same corpus token mass")
    // longer contexts -> fewer chunks, and (on fixed-size docs) no better fill
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq)
    assert(rows.forall(r => r._4 > 0.5 && r._4 < 1.1),
      s"fill must hug 1 from both sides: ${rows.map(_._4).toSeq}")
  }

  test("x80 rule card: keep is exactly the conjunction, and rules actually bite") {
    val df = SparkEntry.queries("x80_gopher_rule_card")(spark, sf0001)
    val broken = df.filter(col("keep") =!=
      (col("r_wordcount") && col("r_wordlen") && col("r_stopword") && col("r_repetition")))
      .count()
    assert(broken == 0, "keep must restate the rule conjunction")
    // the card is not a rubber stamp on this fixture
    assert(df.filter(!col("r_wordcount")).count() > 0, "word-count rule never fires")
    assert(df.filter(!col("keep")).count() > 0 && df.filter(col("keep")).count() > 0)
    // map-only: the card must not shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") ||
      plan.linesIterator.filter(_.contains("Exchange")).forall(_.contains("rangepartitioning")),
      s"rule card must be map-only (orderBy aside):\n$plan")
  }
}
