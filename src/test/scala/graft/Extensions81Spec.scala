package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions81

/** Batch-81 invariants: sessions split exactly at the 30-minute gap
  * and the card reads hand-computed values; the DAU decomposition
  * marks day-1 all-new and counts a planted returner correctly.
  */
class Extensions81Spec extends SparkSpec {

  test("x194 planted: gap splits sessions; hand-computed card") {
    import spark.implicits._
    // user 1: events at 0m, 10m (one session, $30), then 50m ($5) - new session
    // user 2: one event ($7)
    val rows = Seq(
      (1L, "2024-03-01 10:00:00", 10.0, 1L),
      (1L, "2024-03-01 10:10:00", 20.0, 2L),
      (1L, "2024-03-01 10:50:00", 5.0, 3L),
      (2L, "2024-03-01 12:00:00", 7.0, 4L))
    val ev = rows.toDF("user_id", "ts0", "value", "event_id")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"),
        col("value"), col("event_id"))
    val out = Extensions81.sessionValueCard(ev, "user_id", "ts", "value",
      "event_id").collect().head
    assert(out.getLong(0) == 3 && out.getLong(1) == 2, s"$out")
    // session values: 30, 5, 7 -> median 7
    assert(out.getDouble(3) == 7.0, s"median session value: $out")
    // durations: 600s, 0, 0 -> median 0
    assert(out.getDouble(5) == 0.0 && out.getDouble(6) > 0.0, s"$out")
  }

  test("x195 planted: day 1 is all-new; a returner counts as returning") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-03-01 10:00:00"), (2L, "2024-03-01 11:00:00"),
      (1L, "2024-03-02 10:00:00"), (3L, "2024-03-02 11:00:00"))
    val ev = rows.toDF("user_id", "ts0")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"))
    val out = Extensions81.dauDecomposition(ev, "user_id", "ts").collect()
      .map(r => r.getString(0) -> r).toMap
    val d1 = out("2024-03-01")
    assert(d1.getLong(1) == 2 && d1.getLong(2) == 2 && d1.getLong(3) == 0)
    assert(d1.getDouble(4) == 1.0)
    val d2 = out("2024-03-02")
    assert(d2.getLong(1) == 2 && d2.getLong(2) == 1 && d2.getLong(3) == 1,
      s"user 1 returns, user 3 is new: $d2")
    assert(d2.getDouble(4) == 0.5)
  }

  test("x194/x195 fixtures: consistent totals") {
    val card = SparkEntry.queries("x194_session_card")(spark, sf0001)
      .collect().head
    assert(card.getLong(0) >= card.getLong(1), "sessions >= users")
    assert(card.getLong(1) == 15L)
    val dau = SparkEntry.queries("x195_dau_decomposition")(spark, sf0001)
      .collect()
    assert(dau.length == 30)
    assert(dau.map(_.getLong(2)).sum == 15L,
      "every user is new exactly once")
    dau.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
  }
}
