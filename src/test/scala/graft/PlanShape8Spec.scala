package graft

/** Round-8 physical-plan contracts: the new operators carry the plan
  * shapes their docstrings claim — asserted on the executed plan, not
  * trusted.
  */
class PlanShape8Spec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("x210 paragraph dedup: no cartesian; the near stage reads the materialized representative set, not parquet again") {
    val df = SparkEntry.queries("x210_paragraph_dedup")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cross:\n$plan")
    // paragraphs materialize once (pk) and reps once: the final plan's
    // parquet scans are bounded (corpus re-read for the doc spine only)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2, s"near/rebuild stages must read checkpoints, got $scans scans:\n$plan")
  }

  test("x211 directed pagerank: per-round dangling agg broadcasts; no cartesian beyond 1-row crossJoins") {
    val df = SparkEntry.queries("x211_directed_pagerank")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the final plan reads ONLY the checkpointed rank table — the
    // iterative lineage (rounds, dangling aggs, edge joins) must NOT
    // replay: zero parquet scans, zero joins, one ExistingRDD read
    // (each round's broadcasts ran inside that round's materialization)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0, s"rounds must read checkpoints, got $scans parquet scans:\n$plan")
    assert(plan.contains("Scan ExistingRDD"), s"final read is the checkpoint:\n$plan")
    assert(!plan.contains("Join"), s"no join may survive into the final read:\n$plan")
  }

  test("x212 stratified sample: the quota table joins broadcast; the ranking window partitions by stratum (no global sort)") {
    val plan = planOf("x212_stratified_sample")
    assert(plan.contains("BroadcastHashJoin"), s"quota join must broadcast:\n$plan")
    assert(plan.contains("Window"), s"per-stratum ranking window expected:\n$plan")
    // the window sort is partition-local: hashpartitioning on the
    // stratum, not a rangepartitioning global sort of the corpus
    val windowRange = plan.linesIterator
      .filter(_.contains("rangepartitioning")).toSeq
    assert(windowRange.forall(!_.contains("md5")),
      s"ranking must not globally range-partition by hash order:\n$plan")
  }

  test("x215 join skew planner: one scan per side, totals broadcast back") {
    val df = SparkEntry.queries("x215_join_skew_plan")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2, s"one scan per join side, got $scans:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row totals must broadcast:\n$plan")
  }

  test("x219 truncation loss: ONE corpus scan feeds every candidate ctx") {
    val plan = planOf("x219_truncation_loss")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"the corpus must tokenize once for all ctx candidates, got $scans:\n$plan")
    assert(!plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"),
      s"the ctx spine must broadcast:\n$plan")
  }

  test("x222 approx-quantile card: single scan, no Expand, both quantile buffers in one aggregation") {
    val plan = planOf("x222_approx_quantiles")
    assert(!plan.contains("Expand"), s"no multi-distinct amplification:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"one events scan, got $scans:\n$plan")
  }

  test("x226 cosine curve: candidates via bucket equi-join, never a vector cross product") {
    val df = SparkEntry.queries("x226_cosine_curve")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only nested-loop join allowed is the broadcast threshold spine
    val bnl = plan.linesIterator.count(_.contains("CartesianProduct"))
    assert(bnl == 0, s"bucketed candidates must equi-join:\n$plan")
  }
}
