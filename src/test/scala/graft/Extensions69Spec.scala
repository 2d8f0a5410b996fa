package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions69

/** Batch-69 invariants: decay halves a score exactly one half-life
  * back and ranks recency over raw size; Gini reads 0 on equality and
  * (n-1)/n on a single whale.
  */
class Extensions69Spec extends SparkSpec {

  private def ev(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "ts0", "value")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"), col("value"))
  }

  test("x170 planted: one half-life back halves the score; recency outranks size") {
    // ref = max ts = user 3's event
    val out = Extensions69.decayedEngagement(ev(
      (1L, "2024-03-08 12:00:00", 100.0),   // 7 days old: weight 1/2
      (2L, "2024-03-15 12:00:00", 60.0),    // now: weight 1
      (3L, "2024-03-15 12:00:00", 1.0)),
      "user_id", "ts", "value", halfLifeDays = 7.0, topK = 10)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getDouble(3) == 50.0, s"exact half: ${out(1L)}")
    assert(out(2L).getDouble(3) == 60.0)
    assert(out(2L).getLong(0) == 1L && out(1L).getLong(0) == 2L,
      "fresh 60 outranks stale 100")
  }

  test("x171 planted: equality reads 0; a single whale reads (n-1)/n") {
    import spark.implicits._
    val equal = (1L to 10L).map(u => (u, "a", 5.0))
    val whale = (1L to 9L).map(u => (u, "b", 0.0)) :+ ((10L, "b", 90.0))
    val out = Extensions69.giniConcentration(
      (equal ++ whale).toDF("user_id", "g", "value"), "g", "user_id", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(3) == 0.0, s"perfect equality: ${out("a")}")
    assert(out("b").getDouble(3) == 0.9, s"one whale of 10 -> 9/10: ${out("b")}")
    assert(out("b").getLong(1) == 10L && out("b").getDouble(2) == 90.0)
  }

  test("x170/x171 fixtures: ranks ordered; ginis in [0,1)") {
    val top = SparkEntry.queries("x170_decayed_engagement")(spark, sf0001)
      .collect()
    assert(top.length <= 20 && top.nonEmpty)
    val scores = top.map(_.getDouble(3)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val gini = SparkEntry.queries("x171_gini")(spark, sf0001).collect()
    assert(gini.nonEmpty)
    gini.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, s"$r")
    }
  }
}
