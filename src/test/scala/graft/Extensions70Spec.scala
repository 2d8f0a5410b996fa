package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions70

/** Batch-70 invariants: the recs eval credits learnable pairs and
  * penalizes novel ones; Chapman reproduces a hand-computed estimate
  * and is exact under full overlap.
  */
class Extensions70Spec extends SparkSpec {

  test("x172 planted: a repeated co-purchase hits; a novel pairing misses") {
    import spark.implicits._
    // train: items A,B co-purchased twice (recs(A) includes B);
    // test: one basket (A,B) -> hit pair; one basket (A,C) with C unseen
    val rows = Seq(
      (1L, "A", "2024-01-01"), (1L, "B", "2024-01-01"),
      (2L, "A", "2024-01-02"), (2L, "B", "2024-01-02"),
      (10L, "A", "2024-02-01"), (10L, "B", "2024-02-01"),
      (11L, "A", "2024-02-02"), (11L, "C", "2024-02-02"))
      .toDF("b", "i", "ts0")
      .select(col("b"), col("i"), to_timestamp(col("ts0")).as("ts"))
    val out = Extensions70.recsHoldoutEval(rows, "b", "i", "ts",
      "2024-01-15 00:00:00").collect().head
    assert(out.getLong(0) == 2 && out.getLong(1) == 2)
    // test pairs with trained antecedent: (A,B),(B,A) hit; (A,C) misses
    // ((C,A) drops: C has no rec list)
    assert(out.getLong(2) == 3 && out.getLong(3) == 2, s"$out")
    assert(out.getDouble(4) == 0.6667)
  }

  test("x173 planted: full overlap reads the exact population; partial overlap matches Chapman") {
    import spark.implicits._
    def ev(u: Long, d: String) = (u, s"2024-01-$d 12:00:00")
    // 10 users, all seen in both windows -> N = (11*11/11) - 1 = 10 exact
    val full = (1L to 10L).flatMap(u => Seq(ev(u, "02"), ev(u, "16")))
    val df1 = full.toDF("user_id", "ts0")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"))
    val r1 = Extensions70.captureRecapture(df1, "user_id", "ts",
      "2024-01-01 00:00:00", "2024-01-08 00:00:00",
      "2024-01-15 00:00:00", "2024-01-22 00:00:00").collect().head
    assert(r1.getDouble(3) == 10.0 && r1.getLong(4) == 10L, s"$r1")
    // n1=4 (users 1-4), n2=4 (users 3-6), m=2 -> (5*5/3)-1 = 7.3333
    val part = Seq(1L, 2L, 3L, 4L).map(ev(_, "02")) ++
      Seq(3L, 4L, 5L, 6L).map(ev(_, "16"))
    val df2 = part.toDF("user_id", "ts0")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"))
    val r2 = Extensions70.captureRecapture(df2, "user_id", "ts",
      "2024-01-01 00:00:00", "2024-01-08 00:00:00",
      "2024-01-15 00:00:00", "2024-01-22 00:00:00").collect().head
    assert(r2.getDouble(3) == 7.3333, s"Chapman by hand: $r2")
    assert(r2.getLong(4) == 6L)
  }

  test("x172/x173 fixtures: sane counts") {
    val recs = SparkEntry.queries("x172_recs_eval")(spark, sf0001)
      .collect().head
    assert(recs.getLong(0) > 0 && recs.getLong(1) > 0)
    assert(recs.getLong(3) <= recs.getLong(2))
    val cap = SparkEntry.queries("x173_capture_recapture")(spark, sf0001)
      .collect().head
    assert(cap.getLong(4) == 15L, "fixture has 15 users")
    assert(cap.getDouble(3) > 0.0)
  }
}
