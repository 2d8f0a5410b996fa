package graft

import org.apache.spark.sql.functions._

/** Round-9 physical-plan contracts: the new operators keep windows
  * partitioned, small sides broadcast, and per-row transforms
  * join-free.
  */
class PlanShape10Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("x235 oovCurve: type ranking windows ride the range-partition id, spine/totals broadcast") {
    val plan = planOf(SparkEntry.queries("x235_oov_curve")(spark, sf0001))
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("__pid")),
      s"the type table must never cross an unpartitioned window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the vocab spine and totals must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("x241 knn eval: every window partitions on the query id, the query block broadcasts") {
    val plan = planOf(SparkEntry.queries("x241_knn_eval")(spark, sf0001))
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("q_id#")),
      s"rank and vote windows must partition by q_id:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the query block must broadcast against the candidate scan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("x246 watermark plan: the per-event lateness join broadcasts the batch grid") {
    val plan = planOf(SparkEntry.queries("x246_watermark_plan")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"hwm grid must broadcast back onto the events:\n$plan")
    // the only window in the plan is the grid's running max — it may be
    // unpartitioned, but everything reaching it is the O(batches) agg
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("x240 chunker: one Generate, zero joins (a pure per-row transform)") {
    val df = graft.ops.Extensions105.chunkDocuments(
      graft.model.Tables.load(spark, sf0001, "documents"), "doc_id", "text")
    val plan = planOf(df)
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"chunking must be map-only:\n$plan")
    assert(plan.contains("Generate posexplode"),
      s"the explode is the only fan-out:\n$plan")
  }

  test("x239 z-value: bounds ride one broadcast, morton math stays in codegen") {
    val df = graft.ops.Extensions105.withZValue(
      graft.model.Tables.load(spark, sf0001, "lineitem"), "l_partkey", "l_suppkey")
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the 1-row bounds agg must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
    // codegen shows as "*(n)" stage markers in the executed-plan string
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("zval")),
      s"the interleave must run inside a codegen stage:\n$plan")
  }

  test("x244 as-of read: the fold partially aggregates (map-side combine before the shuffle)") {
    val plan = planOf(SparkEntry.queries("x244_asof_state")(spark, sf0001))
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("partial_")) || plan.contains("ObjectHashAggregate"),
      s"latestState must fold map-side so the shuffle carries states, not events:\n$plan")
  }
}
