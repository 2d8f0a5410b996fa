package graft

import org.apache.spark.sql.functions._

/** Physical-plan contracts for x260–x266: unit folds are hash
  * aggregates, grids broadcast, the tokenizer DP stays UDF-free, and
  * nothing row-sized crosses a cartesian product.
  */
class PlanShape12Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("x260 CEM: one unit fold, arm join on cells, globals broadcast") {
    val plan = planOf(SparkEntry.queries("x260_cem_att")(spark, sf0001))
    assert(plan.contains("HashAggregate"), s"unit/arm folds hash:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"ATT totals + pruned counts broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"nothing unit-sized crosses a window:\n$plan")
  }

  test("x262 changepoint: windows ride the aggregated day grid") {
    val df = SparkEntry.queries("x262_changepoint")(spark, sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the raw scan feeds ONE hash aggregate before any window
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"the day aggregation sits below every window:\n$plan")
  }

  test("x263 unigram: the DP is UDF-free and the vocab broadcasts") {
    import spark.implicits._
    val words = Seq(("scanning", 3L), ("sorting", 2L)).toDF("w", "wn")
    val vocab = Seq(("scan", 10L, 100L), ("ning", 8L, 120L),
      ("sort", 9L, 110L), ("ing", 12L, 90L), ("s", 2L, 500L),
      ("c", 1L, 600L), ("a", 1L, 600L), ("n", 3L, 400L), ("o", 1L, 600L),
      ("r", 1L, 600L), ("t", 2L, 500L), ("i", 2L, 500L), ("g", 2L, 500L))
      .toDF("piece", "cnt", "cost")
    val plan = planOf(
      graft.ops.Extensions116.viterbiSegment(words, vocab, maxK = 6))
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"the Viterbi DP must live in codegen'd HOFs:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"piece costs broadcast onto the step grid:\n$plan")
  }

  test("x265 valuation: scoring passes read the materialized features, not the corpus") {
    val df = SparkEntry.queries("x265_data_valuation")(spark, sf0001)
    df.collect()
    // the RESULT is a local table built from G+1 trainings over the
    // materialized feature table; its plan must not rescan anything
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"the card is driver-assembled from O(model) reads:\n$plan")
  }

  test("x266 Theil-Sen: the pair stage runs on the materialized series grid") {
    val plan = planOf(SparkEntry.queries("x266_theil_sen")(spark, sf0001))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0,
      s"pairs/medians read the materialized day grid (got $scans scans):\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the median slope broadcasts onto the residual pass:\n$plan")
  }
}
