package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions73

/** Batch-73 invariants: the churn fit recovers a planted geometric
  * decay exactly; MASE crowns the seasonal baseline on a weekly
  * pattern and the naive one on a smooth trend.
  */
class Extensions73Spec extends SparkSpec {

  test("x178 planted: an exact halving retention reads churn 0.5 with r2 1") {
    import spark.implicits._
    // 80 users: 40 active in week 1, 20 in week 2, 10 in week 3
    // (each active user gets one event in the week's middle). A sentinel
    // user (81) pins the log end at Jan 29 so week 3 — [Jan 22, Jan 29)
    // after the Jan 1 firsts — is FULLY observed: the censoring gate
    // admits users with first_ts <= end - (maxK+1) weeks = Jan 1 10:00
    // (boundary inclusive), i.e. all 80; the sentinel itself is gated out.
    val rows = (1L to 80L).flatMap { u =>
      val first = Seq((u, "2024-01-01 10:00:00"))
      val w1 = if (u <= 40) Seq((u, "2024-01-09 10:00:00")) else Nil
      val w2 = if (u <= 20) Seq((u, "2024-01-16 10:00:00")) else Nil
      val w3 = if (u <= 10) Seq((u, "2024-01-23 10:00:00")) else Nil
      first ++ w1 ++ w2 ++ w3
    } :+ (81L, "2024-01-29 10:00:00")
    val ev = rows.toDF("user_id", "ts0")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"))
    val out = Extensions73.churnRateFit(ev, "user_id", "ts").collect().head
    assert(out.getLong(0) == 3 && out.getDouble(1) == 0.5, s"$out")
    assert(out.getDouble(3) == 0.5, s"halving -> churn 0.5: $out")
    assert(out.getDouble(4) > 0.9999, s"pure geometric -> r2 ~ 1: $out")
  }

  test("x179 planted: weekly pattern favors snaive; a ramp favors naive") {
    import spark.implicits._
    def series(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (f"2024-03-${i + 1}%02d 12:00:00", v)
    }.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
    // strong weekly pattern: snaive error 0
    val weekly = (0 until 21).map(i => if (i % 7 == 0) 100.0 else 10.0)
    val r1 = Extensions73.forecastBaselineCard(series(weekly), "ts", "value")
      .collect().head
    assert(r1.getDouble(2) == 0.0 && r1.getBoolean(4),
      s"pure weekly -> snaive exact: $r1")
    // smooth ramp: naive error 1/day, snaive error 7/day -> mase 7
    val ramp = (0 until 21).map(i => 10.0 + i)
    val r2 = Extensions73.forecastBaselineCard(series(ramp), "ts", "value")
      .collect().head
    assert(r2.getDouble(1) == 1.0 && r2.getDouble(2) == 7.0 &&
      r2.getDouble(3) == 7.0 && !r2.getBoolean(4), s"ramp: $r2")
  }

  test("x178/x179 fixtures: sane ranges") {
    val churn = SparkEntry.queries("x178_churn_fit")(spark, sf0001)
      .collect().head
    assert(churn.getLong(0) >= 2)
    if (!churn.isNullAt(3))
      assert(churn.getDouble(3) > -1.0 && churn.getDouble(3) < 1.0)
    val fc = SparkEntry.queries("x179_forecast_baselines")(spark, sf0001)
      .collect().head
    assert(fc.getLong(0) == 23L, "30 fixture days - 7 lag")
    assert(fc.getDouble(1) > 0.0 && fc.getDouble(2) > 0.0)
  }
}
