package graft

/** Executed-plan shape assertions for the round-7 batch-75..84
  * operators.
  */
class PlanShape7cSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("x182 ks: value-grid windows, no global sort of users") {
    val plan = planOf("x182_ks_test")
    assert(!plan.contains("CartesianProduct"), s"no cross:\n$plan")
    // the one rangepartitioning allowed is the grid-ordered window
    val rp = plan.linesIterator.count(_.contains("rangepartitioning"))
    assert(rp <= 1, s"only the grid window may range-partition:\n$plan")
  }

  test("x186 version audit: ONE key hash-agg, no per-version window after it") {
    val plan = planOf("x186_version_audit")
    // the row_number fixture window is upstream; after the audit agg no
    // further Window node may appear (gaps come from min/max/distinct)
    assert(plan.contains("HashAggregate"), s"audit is an agg:\n$plan")
  }

  test("x193 audience overlap: subject-keyed equi-join, never set-cross") {
    val plan = planOf("x193_audience_overlap")
    assert(!plan.contains("CartesianProduct"),
      s"pairs come from the subject join:\n$plan")
  }

  test("x198 theil-sen: the pair join runs on the AGGREGATED daily table") {
    val plan = planOf("x198_theil_sen")
    // daily is materialized (localCheckpoint) so the pair join's inputs
    // are checkpoint scans, not raw parquet re-reads
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0, s"pairs read the checkpointed daily table:\n$plan")
  }

  test("x200 one-pager: seven rows from two materialized wide results — zero rescans") {
    val plan = planOf("x200_corpus_one_pager")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0,
      s"KPI rows must not rescan the corpus per metric:\n$plan")
  }
}
