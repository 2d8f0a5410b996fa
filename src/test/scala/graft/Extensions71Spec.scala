package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions71

/** Batch-71 invariants: payback crosses at the hand-computed offset
  * (and honestly never for a poor cohort); ABC bands split exactly at
  * the 80/95 cumulative cuts.
  */
class Extensions71Spec extends SparkSpec {

  test("x174 planted: a cohort crossing CAC at offset 2; another never") {
    import spark.implicits._
    // cohort week of 2024-01-01 (Mon): 2 users, $30/user/week -> cum ltv
    // 30, 60, 90, 120 -> crosses 100 at offset 3
    val rich = (1L to 2L).flatMap { u =>
      (0 until 4).map(w => (u, f"2024-01-${1 + 7 * w}%02d 10:00:00", 30.0))
    }
    // cohort of 2024-01-02? same week; use week of Feb 5 (Mon): $1/user
    val poor = Seq((9L, "2024-02-05 10:00:00", 1.0))
    val ev = (rich ++ poor).toDF("user_id", "ts0", "value")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"), col("value"))
    val out = Extensions71.cohortPayback(ev, "user_id", "ts", "value", 100.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = out("2024-01-01")
    assert(r1.getLong(2) == 3L && r1.getBoolean(4), s"crosses at 3: $r1")
    assert(r1.getDouble(3) == 120.0)
    val r2 = out("2024-02-05")
    assert(r2.isNullAt(2) && !r2.getBoolean(4), s"never pays back: $r2")
  }

  test("x175 planted: bands split exactly at the cumulative cuts") {
    import spark.implicits._
    // revenues 70, 20, 6, 4 (total 100): cum 70(A), 90(B? 90<=80? no ->
    // 70<=80 A; 90 <= 95 B; 96 C? 96>95 -> C; 100 C)
    val rows = Seq(("p1", 70.0), ("p2", 20.0), ("p3", 6.0), ("p4", 4.0))
      .toDF("k", "v")
    val out = Extensions71.abcClassification(rows, "k", "v").collect()
      .map(r => r.getString(1) -> r).toMap
    assert(out("p1").getString(4) == "A" && out("p1").getDouble(3) == 0.7)
    assert(out("p2").getString(4) == "B" && out("p2").getDouble(3) == 0.9)
    assert(out("p3").getString(4) == "C", "cum 96% > 95 -> C")
    assert(out("p4").getString(4) == "C")
    assert(out("p1").getLong(0) == 1L)
  }

  test("x175 planted: a key exactly ON the cut stays in the tighter band") {
    import spark.implicits._
    val rows = Seq(("a", 80.0), ("b", 15.0), ("c", 5.0)).toDF("k", "v")
    val out = Extensions71.abcClassification(rows, "k", "v").collect()
      .map(r => r.getString(1) -> r.getString(4)).toMap
    assert(out("a") == "A", "cum exactly 80% is A (<=)")
    assert(out("b") == "B", "cum exactly 95% is B (<=)")
    assert(out("c") == "C")
  }

  test("x174/x175 fixtures: classes present, shares monotone") {
    val pay = SparkEntry.queries("x174_cohort_payback")(spark, sf0001)
      .collect()
    assert(pay.nonEmpty)
    val abc = SparkEntry.queries("x175_abc")(spark, sf0001).collect()
    assert(abc.nonEmpty)
    val shares = abc.map(_.getDouble(3)).toSeq
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(abc.map(_.getString(4)).distinct.toSet.subsetOf(Set("A", "B", "C")))
  }
}
