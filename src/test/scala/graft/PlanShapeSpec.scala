package graft

import org.apache.spark.sql.functions._

/** Executed-plan shape assertions for the round-4 operators — each claim
  * in PLANS.md that matters at 100 TB, pinned so a refactor cannot
  * silently regress it.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("x48 density prune: both windows share one exchange on cell") {
    val plan = planOf("x48_density_prune")
    // two Window nodes (row_number + count) must not be separated by an
    // Exchange — they run on the same cell partitioning
    val lines = plan.linesIterator.toSeq
    val wIdx = lines.zipWithIndex.filter(_._1.contains("Window")).map(_._2)
    assert(wIdx.size >= 2, s"expected stacked Window nodes:\n$plan")
    val between = lines.slice(wIdx.min, wIdx.max)
    assert(!between.exists(_.contains("Exchange")),
      s"windows over the same cell spec must share one exchange:\n$plan")
  }

  test("x57 sketch: signature aggregation is map-side partial") {
    val plan = planOf("x57_source_overlap_sketch")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"signature mins must partial-aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pair phase must not be a cartesian of the corpus:\n$plan")
  }

  test("x52 curriculum deciles: no single-partition window (the ntile anti-shape)") {
    val plan = planOf("x52_curriculum_deciles")
    // no Window node at all = no ntile, no per-row rank machinery; the
    // only single-partition exchange is the percentile scalar agg
    assert(!plan.contains("Window"), s"assignment must be map-side:\n$plan")
  }

  test("x61 budget select: the quality sort is per-shard, not global") {
    val plan = planOf("x61_budget_select")
    // the window's exchange must be hash-partitioned on shard, never a
    // range partitioning over score (= a global sort of the corpus)
    assert(plan.contains("hashpartitioning"),
      s"expected hash partitioning on shard:\n$plan")
    val winSort = plan.linesIterator.filter(l =>
      l.contains("Sort ") && l.contains("score"))
    assert(winSort.forall(!_.contains("true, 0")) || // global sort flag absent
      !plan.contains("rangepartitioning(score"),
      s"score sort must stay shard-local:\n$plan")
  }

  test("x60 split groups land as partial aggregation over the map-only assignment") {
    val plan = planOf("x60_stratified_split")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"split balance counts must partial-aggregate:\n$plan")
  }

  /** Total `Scan parquet` nodes across EVERY query execution a full run
    * of the query triggers — the localCheckpoint materialization job
    * surfaces its parquet scan here (the downstream plan only shows
    * `Scan ExistingRDD`), so this counts what a plain executed-plan
    * string cannot: the real number of corpus reads.
    */
  private def parquetScanCount(name: String): Long = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val scans = new java.util.concurrent.atomic.AtomicLong(0L)
    val idle = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        // an AQE plan prints BOTH "Final Plan" and "Initial Plan" sections
        // — count the final section only or every scan doubles
        val s = qe.executedPlan.toString
        val finalOnly = s.indexOf("== Initial Plan ==") match {
          case -1 => s
          case i => s.substring(0, i)
        }
        scans.addAndGet("Scan parquet".r.findAllIn(finalOnly).length.toLong)
        idle.incrementAndGet()
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries(name)(spark, sf0001)
        .write.format("noop").mode("overwrite").save()
      // the execution listener bus is async: wait until events stop
      var last = -1L
      var spins = 0
      while ((idle.get() != last || last == -1L) && spins < 50) {
        last = idle.get(); Thread.sleep(100); spins += 1
      }
      scans.get()
    } finally spark.listenerManager.unregister(listener)
  }

  test("scan-count baseline: x27 reads the corpus exactly once (round-3 fix stays fixed)") {
    // gram index materialized once; both consumers read the checkpoint —
    // a regression to double-scan shows up as 2
    assert(parquetScanCount("x27_dupgram_coverage") == 1L,
      "x27 must read the corpus exactly once")
  }

  test("scan-count baseline: x45 source overlap reads the corpus exactly once") {
    assert(parquetScanCount("x45_source_overlap") == 1L,
      "x45's deduped index must materialize from one corpus scan")
  }

  test("scan-count baseline: x68 substring dedup is exactly two corpus scans") {
    // index build + rewrite join — the documented minimum for a global-
    // statistic-then-rewrite operator
    assert(parquetScanCount("x68_strip_dup_spans") == 2L,
      "x68 must be exactly two corpus scans (gram index + rewrite)")
  }

  // ---- round-6 shapes ---------------------------------------------------------

  test("x94 scoring pass: map-only serving — no join, no window (the model is literals)") {
    val plan = planOf("x94_quality_logreg")
    assert(!plan.contains("Join"), s"serving must not join a weight table:\n$plan")
    assert(!plan.contains("Window"), s"serving has no window:\n$plan")
  }

  test("x97 CUPED: sufficient statistics only — no window, no per-user float agg shape") {
    val plan = planOf("x97_cuped")
    assert(!plan.contains("Window"),
      s"CUPED readout is hash-aggs over exact sums, never a window:\n$plan")
  }

  test("x101 embedding health: one aggregation pass, no joins, no pair machinery") {
    val plan = planOf("x101_embedding_health")
    assert(!plan.contains("Join"),
      s"the pairwise dot must come from the sum-vector identity, not a join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("x95 / x102 ADC: the distance tables broadcast; nothing goes cartesian") {
    Seq("x95_pq_topk", "x102_ivfpq").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: per-query distance tables must broadcast-join the codes:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q must not go all-pairs:\n$plan")
    }
  }

  test("x99 triangles: ordered equi-joins only — never a cartesian wedge explosion") {
    val plan = planOf("x99_triangles")
    assert(!plan.contains("CartesianProduct"),
      s"triangle enumeration must stay equi-join:\n$plan")
  }

  test("x105 calibration: the precision walk's window runs over the aggregated margin grid") {
    val plan = planOf("x105_calibrate_gate")
    // HashAggregate (distinct margins) must appear BELOW the Window in
    // the plan tree (i.e. later in the printed plan = earlier in
    // execution), so the window never sees raw scored rows
    val lines = plan.linesIterator.toSeq
    val wIdx = lines.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"expected the walk window:\n$plan")
    assert(lines.drop(wIdx).exists(_.contains("HashAggregate")),
      s"the window must consume the aggregated margin grid:\n$plan")
  }

  test("x109 PII scrub: map-only — no join, no window, no exchange beyond the scan") {
    val plan = planOf("x109_pii_scrub")
    assert(!plan.contains("Join"), s"scrub must not join:\n$plan")
    assert(!plan.contains("Window"), s"scrub has no window:\n$plan")
  }

  test("x110 mSPRT: sufficient statistics only — no window, no cartesian") {
    val plan = planOf("x110_msprt")
    assert(!plan.contains("Window"),
      s"the monitor is hash-aggs over exact sums, never a window:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("x108 k-anonymize: class-level joins only — no window over the corpus") {
    val plan = planOf("x108_k_anonymize")
    assert(!plan.contains("Window"),
      s"ladder decisions are class-size aggs + semi/anti joins, never a window:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("x112 survival: windows run over the aggregated lifetime grid, not the event log") {
    val plan = planOf("x112_survival")
    val lines = plan.linesIterator.toSeq
    val wIdx = lines.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"expected the cumulative-product window:\n$plan")
    assert(lines.drop(wIdx).exists(_.contains("HashAggregate")),
      s"the window must consume the per-lifetime aggregate, not raw events:\n$plan")
  }
}
