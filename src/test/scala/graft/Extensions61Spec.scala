package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions61

/** Batch-61 invariants: the correlogram peaks exactly at a planted
  * shift lag; funnel timing reproduces hand-timed step delays and
  * leaves non-converting transitions NULL.
  */
class Extensions61Spec extends SparkSpec {

  test("x154 planted: a series shifted by 2 days peaks at lag +2 with corr 1") {
    import spark.implicits._
    // value pattern v(d); event COUNT per day is constant 1, so build
    // the lead structure in value vs count by adding extra zero-value
    // events: count(d) = pattern(d+2) -> A leads B? A_t corr B_{t+2}.
    // Simpler: value v(d) = p(d), count c(d) = 1 + p(d-  -2)... use:
    // rows per day: p(d) copies of (value 0) plus one row (value p(d+2)*1.0)
    val p = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8)
    val rows = (0 until 10).flatMap { d =>
      val day = f"2024-03-${d + 1}%02d 12:00:00"
      // count today encodes p(d); value today encodes p(d+2)
      Seq.fill(p(d) - 1)((day, 0.0)) :+ ((day, p(d + 2).toDouble))
    }
    val ev = rows.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
    val out = Extensions61.leadLagCorrelation(ev, "ts", "value", maxLag = 3)
      .collect()
    val peak = out.filter(_.getBoolean(3))
    assert(peak.length == 1 && peak.head.getLong(0) == 2L,
      s"value today = count in 2 days -> peak at +2: ${out.toSeq}")
    assert(peak.head.getDouble(2) == 1.0, s"exact shift -> corr 1: ${peak.head}")
  }

  test("x154 planted: a constant series yields NULL corr everywhere, no peak") {
    import spark.implicits._
    val ev = (1 to 8).map(d => (f"2024-03-$d%02d 12:00:00", 5.0))
      .toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
    val out = Extensions61.leadLagCorrelation(ev, "ts", "value").collect()
    assert(out.forall(_.isNullAt(2)), s"zero variance -> NULL: ${out.toSeq}")
    assert(out.forall(!_.getBoolean(3)))
  }

  test("x155 planted: hand-timed steps; a step no one completes reads NULL") {
    import spark.implicits._
    // user 1: view at 0s, click at +60s, purchase at +60+300s
    // user 2: view at 0s, click at +120s, no purchase
    val rows = Seq(
      (1L, "2024-03-01 10:00:00", "view"), (1L, "2024-03-01 10:01:00", "click"),
      (1L, "2024-03-01 10:06:00", "purchase"),
      (2L, "2024-03-01 11:00:00", "view"), (2L, "2024-03-01 11:02:00", "click"))
    val ev = rows.toDF("user_id", "ts0", "event_type")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"),
        col("event_type"))
    val out = Extensions61.funnelStepTiming(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), 24L * 3600 * 1000000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val vc = out(("view", "click"))
    assert(vc.getLong(2) == 2 && vc.getDouble(3) == 90.0,
      s"median of 60s and 120s = 90s: $vc")
    val cp = out(("click", "purchase"))
    assert(cp.getLong(2) == 1 && cp.getDouble(3) == 300.0, s"$cp")
    // with no purchasers at all, that transition reads 0/NULL
    val none = Extensions61.funnelStepTiming(
      ev.filter(col("event_type") =!= "purchase"), "user_id", "event_type",
      "ts", Seq("view", "click", "purchase"), 24L * 3600 * 1000000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val n2 = none(("click", "purchase"))
    assert(n2.getLong(2) == 0 && n2.isNullAt(3) && n2.isNullAt(4),
      s"no converters -> NULL timing: $n2")
  }

  test("x155 fixture: transitions ordered, p90 >= median, counts consistent with x85") {
    val out = SparkEntry.queries("x155_step_timing")(spark, sf0001).collect()
    assert(out.length == 2)
    out.foreach { r =>
      if (!r.isNullAt(3) && !r.isNullAt(4))
        assert(r.getDouble(4) >= r.getDouble(3), s"p90 >= median: $r")
    }
  }
}
