package graft

/** Executed-plan shape assertions for the round-7 batch-53..58
  * operators — each PLANS.md claim that matters at 100 TB, pinned so a
  * refactor cannot silently regress it.
  */
class PlanShape7Spec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("x138 seasonal: every window runs over the aggregated daily table (one corpus scan)") {
    val plan = planOf("x138_seasonal")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"one corpus scan feeds the decomposition:\n$plan")
  }

  test("x139 robust outliers: per-group models come back as broadcast joins") {
    val plan = planOf("x139_robust_outliers")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"median/MAD tables must broadcast, never shuffle the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join for a <=groups model table:\n$plan")
  }

  test("x141 chi-square: totals broadcast; no cartesian of the vocabulary") {
    val plan = planOf("x141_chi2_tokens")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row totals must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian anywhere in the token scoring:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-k must be a TakeOrdered cut, not a global sort:\n$plan")
  }

  test("x143 expectations: scalar checks share ONE scan of the audited table") {
    val plan = planOf("x143_expectations")
    // orders is scanned once for the 4 scalar checks + once for the FK
    // probe side; customer once for the FK dim: 3 scans total
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 3,
      s"4 scalar checks + 1 FK must not exceed 3 scans, got $scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"FK dim keys must broadcast into a LEFT ANTI:\n$plan")
  }

  test("x146 item-item: pair enumeration is an equi-join on the basket key, never a cross") {
    val plan = planOf("x146_item_item")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"item pairs must come from the basket equi-join:\n$plan")
  }

  test("x144 map/mrr: eval windows never touch a corpus-sized table") {
    val plan = planOf("x144_map_mrr")
    // the AP window partitions by q_id over <= queries*k rows; assert the
    // ranking cut upstream keeps it bounded (rk filter pushed below the join)
    assert(plan.contains("Window"), s"cumulative-hit window present:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross:\n$plan")
  }

  test("x145 conformal: quantile thresholds broadcast into the eval pass") {
    val plan = planOf("x145_conformal")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the |levels|-row threshold table must broadcast:\n$plan")
  }
}
