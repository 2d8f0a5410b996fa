package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions83

/** Batch-83 invariants: Theil-Sen recovers an exact linear slope and
  * shrugs off a planted outlier day; burstiness reads a metronome at
  * -1 and signs a bursty pattern positive.
  */
class Extensions83Spec extends SparkSpec {

  private def daySeries(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (f"2024-03-${i + 1}%02d 12:00:00", v)
    }.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
  }

  test("x198 planted: exact linear slope; one corrupted day cannot move it") {
    val lin = (0 until 15).map(i => 10.0 + 2.5 * i)
    val r1 = Extensions83.theilSenTrend(daySeries(lin), "ts", "value")
      .collect().head
    assert(r1.getDouble(3) == 2.5, s"slope 2.5 dollars/day exactly: $r1")
    val corrupted = lin.updated(7, 100000.0)
    val r2 = Extensions83.theilSenTrend(daySeries(corrupted), "ts", "value")
      .collect().head
    assert(r2.getDouble(3) == 2.5, s"median slope ignores the outlier: $r2")
  }

  test("x199 planted: a metronome reads -1; clustered bursts read positive") {
    import spark.implicits._
    // user 1: clicks exactly 60s apart (sigma 0 -> B = -1)
    val metro = (0 until 10).map(i =>
      (1L, "click", f"2024-03-01 10:${i}%02d:00"))
    // user 2: two tight bursts far apart: gaps 1s x8 and one 86400s
    val bursty = (0 until 5).map(i =>
      (2L, "view", f"2024-03-01 10:00:0$i")) ++
      (0 until 5).map(i => (2L, "view", f"2024-03-02 10:00:0$i"))
    val ev = (metro ++ bursty).toDF("user_id", "event_type", "ts0")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("ts0")).as("ts"))
    val out = Extensions83.burstinessIndex(ev, "user_id", "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("click").getDouble(2) == -1.0, s"metronome: ${out("click")}")
    assert(out("view").getDouble(2) > 0.4, s"bursts read positive: ${out("view")}")
  }

  test("x198/x199 fixtures: bounded outputs") {
    val ts = SparkEntry.queries("x198_theil_sen")(spark, sf0001)
      .collect().head
    assert(ts.getLong(0) == 30L && ts.getLong(1) == 435L, "C(30,2) pairs")
    val b = SparkEntry.queries("x199_burstiness")(spark, sf0001).collect()
    assert(b.length == 5)
    b.foreach(r => assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }
}
