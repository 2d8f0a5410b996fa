package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions72

/** Batch-72 invariants: the dispersion index reads hand-computed
  * values (constant counts underdispersed, bursty clumps flagged);
  * the hourly profile's shares and peak are exact.
  */
class Extensions72Spec extends SparkSpec {

  private def ev(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("event_type", "ts0")
      .select(col("event_type"), to_timestamp(col("ts0")).as("ts"))
  }

  test("x176 planted: constant daily counts underdisperse; a burst overdisperses") {
    // type a: exactly 2/day for 5 days -> s2=20, s1=10:
    //   index = (5*20-100)/(4*10) = 0 (constant -> zero variance)
    // type b: 10 on one day, 0 on four -> index = (5*100-100)/(4*10) = 10
    val a = (1 to 5).flatMap(d => Seq(
      ("a", f"2024-03-0$d%d 10:00:00"), ("a", f"2024-03-0$d%d 11:00:00")))
    val b = (1 to 10).map(i => ("b", f"2024-03-01 $i%02d:10:00"))
    val out = Extensions72.overdispersionCheck(ev(a ++ b: _*), "event_type",
      "ts").collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(3) == 0.0 && !out("a").getBoolean(4),
      s"constant counts -> zero dispersion: ${out("a")}")
    assert(out("b").getDouble(3) == 10.0 && out("b").getBoolean(4),
      s"one-day burst -> index 10: ${out("b")}")
    assert(out("a").getLong(1) == 5L, "global day spine")
  }

  test("x177 planted: exact shares and earliest-tie peak") {
    val rows = Seq(
      ("a", "2024-03-01 09:10:00"), ("a", "2024-03-01 09:50:00"),
      ("a", "2024-03-01 14:00:00"), ("a", "2024-03-01 14:30:00"),
      ("a", "2024-03-02 20:00:00"))
    val out = Extensions72.hourlyLoadProfile(ev(rows: _*), "event_type", "ts")
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(9L).getLong(2) == 2 && out(9L).getDouble(3) == 0.4)
    assert(out(9L).getBoolean(4), "tie between 9 and 14 -> earliest wins")
    assert(!out(14L).getBoolean(4))
    assert(out(20L).getDouble(3) == 0.2)
  }

  test("x176/x177 fixtures: complete partitions, shares sum ~1 per group") {
    val disp = SparkEntry.queries("x176_overdispersion")(spark, sf0001)
      .collect()
    assert(disp.length == 5)
    disp.foreach(r => assert(r.getLong(1) == 30L, s"30 fixture days: $r"))
    val load = SparkEntry.queries("x177_hourly_load")(spark, sf0001).collect()
    val byG = load.groupBy(_.getString(0))
    byG.foreach { case (g, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"$g shares ~1: $s")
      assert(rows.count(_.getBoolean(4)) == 1, s"$g exactly one peak")
    }
  }
}
