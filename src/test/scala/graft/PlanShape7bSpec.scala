package graft

/** Executed-plan shape assertions for the round-7 batch-59..71
  * operators — the PLANS.md scale claims, pinned.
  */
class PlanShape7bSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("x150 profile: the per-column spine is a broadcast over ONE materialized wide row") {
    val plan = planOf("x150_table_profile")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0, // the wide agg materialized; only the spine remains
      s"profile plan reads no table twice (wide row is checkpointed):\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"spine broadcast:\n$plan")
  }

  test("x157 mann-whitney: no row-level rank window — grid windows only") {
    val plan = planOf("x157_mann_whitney")
    // the only Sort feeds the grid-ordered window; assert no global
    // range-partitioned sort of the per-user table (rangepartitioning
    // appears only in orderBy-style global sorts)
    assert(!plan.contains("rangepartitioning"),
      s"value-grid ranks must not globally sort users:\n$plan")
  }

  test("x171 gini: same discipline — no global sort of users") {
    val plan = planOf("x171_gini")
    // grid windows are partitioned by group (hashpartitioning); the
    // final orderBy of <=groups rows is the only permissible sort
    val rangeSorts = plan.linesIterator.count(_.contains("rangepartitioning"))
    assert(rangeSorts <= 1,
      s"only the final <=groups output orderBy may range-partition:\n$plan")
  }

  test("x162 rules: basket equi-join, min-support before metric joins, TakeOrdered cut") {
    val plan = planOf("x162_assoc_rules")
    assert(!plan.contains("CartesianProduct"), s"no item cross:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered:\n$plan")
  }

  test("x175 abc: the sort is catalog-sized (after the key hash-agg)") {
    val plan = planOf("x175_abc")
    // the window's sort must sit ABOVE a HashAggregate (key table),
    // never directly on the lineitem scan
    val lines = plan.linesIterator.toSeq
    val sortIdx = lines.indexWhere(l => l.contains("Sort ") && l.contains("rev"))
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(sortIdx >= 0 && aggIdx >= 0,
      s"expected sort over the aggregated key table:\n$plan")
  }

  test("x170 decayed engagement: 1-row reference broadcast, TakeOrdered cut") {
    val plan = planOf("x170_decayed_engagement")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"ref_us broadcasts:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k cut:\n$plan")
  }
}
