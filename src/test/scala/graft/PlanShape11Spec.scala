package graft

import org.apache.spark.sql.functions._

/** Physical-plan contracts for x253–x259: the prefix index never
  * cartesians, the linkage pattern fold is one aggregate with no
  * window, the native comparator stays in codegen, the retrieval and
  * transport grids broadcast.
  */
class PlanShape11Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("x253 prefix join: equi-joins only, per-doc window partitioned on doc_id") {
    val plan = planOf(SparkEntry.queries("x253_prefix_filter_pairs")(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("doc_id#")),
      s"the prefix-position window must partition per doc:\n$plan")
  }

  test("x254 Dirichlet QL: corpus stats broadcast, scoring window partitions on q_id") {
    val plan = planOf(SparkEntry.queries("x254_dirichlet_ql")(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"per-query constant + totals must broadcast:\n$plan")
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("q_id#")),
      s"top-k window partitions per query:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("x255 linkage: the pair fold is hash-aggregate only — no window, no sort of pairs") {
    val pairs = graft.ops.Extensions112.documentPairs(spark, sf0001)
    val counted = pairs.groupBy(col("a_mh"), col("a_f3"), col("a_len"))
      .agg(count(lit(1)).as("n"))
    val plan = planOf(counted)
    assert(plan.contains("HashAggregate"), s"pattern fold is a hash agg:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"nothing pair-sized crosses a window or cartesian:\n$plan")
    // and the EM's only input is this <= 2^k-row result (O(model) collect)
    assert(counted.count() <= 8L)
  }

  test("x257 jaro_winkler: the native expression fuses into codegen next to the join") {
    val df = SparkEntry.queries("x257_jaro_winkler")(spark, sf0001)
    val plan = planOf(df)
    assert(plan.contains("jaro_winkler"),
      s"the comparator must appear as a native expression:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"no UDF boxing:\n$plan")
    // executedPlan.toString stars whole-stage-codegen stages as *(n) —
    // the comparator's filter/project line must carry one
    val starred = plan.linesIterator
      .filter(_.contains("jaro_winkler")).toSeq
    assert(starred.nonEmpty && starred.exists(_.trim.matches("""^[+:\-\s]*\*\(\d+\).*""")),
      s"the comparator line must sit inside a codegen stage:\n$starred")
  }

  test("x258 sequence mining: frequent-alphabet prunes broadcast, aggregates hash") {
    val plan = planOf(SparkEntry.queries("x258_seq_patterns")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"the L1/L2 alphabet prunes must broadcast:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"support counting is join+agg algebra only:\n$plan")
  }

  test("x261 typed top-k: object hash aggregate, no Window/Sort of input rows") {
    val plan = planOf(SparkEntry.queries("x261_topk_agg")(spark, sf0001))
    assert(plan.contains("ObjectHashAggregate"),
      s"the typed fold must plan as partial object aggregation:\n$plan")
    assert(!plan.contains("Window"),
      s"nothing row-sized crosses a window:\n$plan")
  }

  test("x259 W1: windows ride the aggregated grid, the corpus is scanned once") {
    val df = SparkEntry.queries("x259_wasserstein")(spark, sf0001)
    val plan = planOf(df)
    // every window partitions on the group of the aggregated histogram,
    // except the bin-gap lead which rides the distinct-bin list
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
    // the histogram is materialized once upstream; the pair/CDF plan
    // must read ONLY that aggregate — zero parquet scans survive here
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0,
      s"pairs/CDFs read the materialized histogram, not the corpus (got $scans):\n$plan")
  }
}
