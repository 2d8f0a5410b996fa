package graft

/** Round-9 physical-plan contracts. */
class PlanShape9Spec extends SparkSpec {

  test("x231 global rank: every window is partitioned (no single-task sort of the data)") {
    val df = SparkEntry.queries("x231_global_rank")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the q20 caveat this operator retires: a Window whose
    // windowspecdefinition has no partition key moves all data to one
    // task. Here every window must ride the range-partition id.
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, s"expected partitioned window ranks in:\n$plan")
    assert(specs.forall(_.contains("__pid")),
      s"every window must partition by the range-partition id:\n$plan")
    // offsets join is a broadcast of the parts-row table, never a shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"the offsets join must broadcast:\n$plan")
  }
}
