package graft

/** Physical-plan contracts for the round-13 operators: the shapes that
  * make them 100 TB-safe, pinned against silent refactor loss.
  */
class PlanShape14Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("x322 packing: every window rides the range-partition id, offsets broadcast") {
    val df = SparkEntry.queries("x322_packing_card")(spark, sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the prefix sum must be the two-pass shape: windows PARTITIONED by
    // the stamped __pid (a corpus-wide unpartitioned running sum is the
    // one-task sort this op exists to avoid), offsets joined broadcast
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty, s"prefix-sum window present:\n$plan")
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"prefix-sum windows must partition by __pid: $w")
    }
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"the O(parts) offset table must broadcast:\n$plan")
  }

  test("x328 BH-FDR: rank windows partitioned, m and cutoff travel broadcast") {
    val df = SparkEntry.queries("x328_bh_fdr")(spark, sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    windows.foreach { w =>
      assert(w.contains("__pid"),
        s"global-rank windows must partition by __pid: $w")
    }
    assert(plan.contains("BroadcastExchange"),
      s"the 1-row m/cutoff tables must broadcast:\n$plan")
  }

  test("x325 windowed attribution: per-conversion windows, user-keyed join") {
    val df = SparkEntry.queries("x325_attribution")(spark, sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty, s"rank/count windows present:\n$plan")
    windows.foreach { w =>
      assert(w.contains("conv_id"),
        s"credit windows must partition by conversion: $w")
    }
  }

  test("x331 one-to-one match: every resolution window is node-partitioned") {
    val pool = {
      import spark.implicits._
      (1L to 50L).flatMap(l => (1L to 5L).map(r =>
        (l, (l % 10) * 10 + r, (l * 7 + r * 13) % 1000))).toDF("l", "r", "s")
    }
    val df = graft.ops.Extensions145.oneToOneMatch(pool, "l", "r", "s", rounds = 2)
    df.collect()
    // the per-round pools are materialized, so assert on a single
    // round's own logical plan: both row_number windows keyed by a node
    val one = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      pool.withColumn("rl", row_number().over(
          Window.partitionBy(col("l")).orderBy(col("s").desc, col("r"))))
        .withColumn("rr", row_number().over(
          Window.partitionBy(col("r")).orderBy(col("s").desc, col("l"))))
        .filter(col("rl") === 1 && col("rr") === 1)
    }
    val logical = one.queryExecution.optimizedPlan.toString
    val windows = logical.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.size >= 2, s"both windows present:\n$logical")
    windows.foreach { w =>
      assert(w.contains("partitionBy") || w.contains("l#") || w.contains("r#"),
        s"resolution windows must be node-partitioned: $w")
    }
  }

  test("x330 JL card: the pair stage only ever sees the bounded sample") {
    val df = SparkEntry.queries("x330_jl_projection")(spark, sf0001)
    val plan = planOf(df)
    // the sampleCap limit runs in the MATERIALIZED sample stage, so the
    // pair join's inputs must both be the checkpointed bounded table
    // (ExistingRDD), broadcast on one side — never a corpus scan (the
    // x241 trap); and the projection card itself must not shuffle
    assert(plan.contains("Scan ExistingRDD"),
      s"pair join reads the materialized bounded sample:\n$plan")
    assert(!plan.linesIterator.exists(l =>
        l.contains("FileScan") || l.contains("BatchScan")),
      s"no corpus scan may reach the pair stage:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the bounded side broadcasts:\n$plan")
  }
}
