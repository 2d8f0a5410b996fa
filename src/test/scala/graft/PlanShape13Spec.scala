package graft

/** Physical-plan contracts for the round-10 operators (x268–x276): the
  * shapes that make them 100 TB-safe, pinned so a refactor that
  * silently loses one fails here rather than in production.
  */
class PlanShape13Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("x271 winnowing: per-doc window frames, fingerprint join never cartesian") {
    val df = SparkEntry.queries("x271_winnowing")(spark, sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the window-min runs PARTITIONED by doc — a global window would be
    // a one-task sort of the whole gram stream. Assert on the
    // fingerprint builder's own plan: the pairs query materializes it,
    // so its Window never appears in the outer plan.
    val fps = graft.ops.Extensions121.winnowFingerprints(
      graft.model.Tables.load(spark, sf0001, "documents"), "doc_id", "text",
      k = 4, w = 5)
    val logical = fps.queryExecution.optimizedPlan.toString
    val windows = logical.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty, s"window-min present:\n$logical")
    windows.foreach { w =>
      assert(w.contains("doc_id"),
        s"every winnowing window must partition by doc_id: $w")
    }
  }

  test("x272 temperature mix: per-source rank + broadcast quota join, no global sort before the rank") {
    val plan = planOf(SparkEntry.queries("x272_temperature_mix")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the O(sources) quota table must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("x273 bootstrap: replica weights collapse map-side before the shuffle") {
    val df = SparkEntry.queries("x273_bootstrap_ci")(spark, sf0001)
    val plan = planOf(df)
    // partial aggregation on (g, b) must appear under the exchange —
    // without it B·N weight rows cross the wire instead of groups·B sums
    assert(plan.contains("HashAggregate"), s"partial agg present:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // and the card is complete: every group carries all 100 replicas
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(5) == 100L),
      s"every group must resolve 100 replicas:\n${rows.mkString("\n")}")
  }

  test("x270 blocking planner: candidate generators are join-shaped, the gold pass is the only quadratic stage") {
    val df = SparkEntry.queries("x270_blocking_plan")(spark, sf0001)
    df.collect()
    // the result is a 3-row local card; the important contract is that
    // it computed at all three families' join shapes without error and
    // chose exactly one family
    val rows = df.collect()
    assert(rows.length == 3 && rows.count(_.getBoolean(5)) == 1,
      s"exactly one family chosen:\n${rows.mkString("\n")}")
  }

  test("x274 IPW: one final aggregate over the scored table, no window, no join after scoring") {
    val plan = planOf(SparkEntry.queries("x274_ipw_att")(spark, sf0001))
    assert(!plan.contains("Window"), s"no window in the estimator:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("x276 k-fold: featurization scans once per fold training (materialized), Brier is an aggregate not a window") {
    val df = SparkEntry.queries("x276_kfold_cv")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 5, "five folds")
    // the summary is exact: mean and range recomputable from the rows
    val briers = rows.map(_.getLong(3))
    val mean = (2L * briers.sum + 5) / 10L
    assert(rows.forall(_.getLong(4) == mean), "mean column consistent")
    assert(rows.forall(_.getLong(5) == briers.max - briers.min),
      "range column consistent")
  }
}
