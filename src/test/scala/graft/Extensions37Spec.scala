package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions37

/** Batch-37 invariants: nDCG bounds and orderings on hand-built
  * rankings; Kaplan–Meier against a hand-computed curve with censoring.
  */
class Extensions37Spec extends SparkSpec {

  test("x111 nDCG: ideal ranking scores 1, inverted ranking scores less, all-zero grades score 0") {
    import spark.implicits._
    val grades = Seq((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L), (1L, 13L, 0L))
      .toDF("q_id", "c_id", "grade")
    val ideal = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
      .toDF("q_id", "c_id", "rk")
    val inverted = Seq((1L, 13L, 1), (1L, 12L, 2), (1L, 11L, 3), (1L, 10L, 4))
      .toDF("q_id", "c_id", "rk")
    val a = Extensions37.ndcgAtK(ideal, grades, 4).head()
    val b = Extensions37.ndcgAtK(inverted, grades, 4).head()
    assert(a.getAs[Double]("ndcg") == 1.0, s"ideal order is nDCG 1: $a")
    assert(b.getAs[Double]("ndcg") < 1.0 && b.getAs[Double]("ndcg") > 0.0,
      s"inverted order strictly between 0 and 1: $b")
    assert(a.getAs[Double]("dcg") == a.getAs[Double]("idcg"))
    // hand value for the ideal DCG: 7/1 + 3/log2(3) + 1/2 + 0
    val expect = 7.0 + 3.0 / (math.log(3.0) / math.log(2.0)) + 0.5
    assert(math.abs(a.getAs[Double]("dcg") - expect) < 1e-3)
    val zeros = Extensions37.ndcgAtK(ideal,
      grades.withColumn("grade", lit(0L)), 4).head()
    assert(zeros.getAs[Double]("ndcg") == 0.0, s"no relevant docs -> 0: $zeros")
  }

  test("x111 fixture: one row per query, ndcg in [0,1], deterministic") {
    val out = SparkEntry.queries("x111_ndcg")(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 6, "queries are doc_id 0..5")
    out.foreach { r =>
      val n = r.getAs[Double]("ndcg")
      assert(n >= 0.0 && n <= 1.0, s"ndcg bounds: $r")
    }
    val again = SparkEntry.queries("x111_ndcg")(spark, sf0001).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("x112 hand-computed curve: deaths step the curve down by (1 - d/n); censoring shrinks risk only") {
    import spark.implicits._
    // 6 subjects, horizon = day 10:
    //  A: days 0..2  -> T=2, death     B: days 0..2 -> T=2, death
    //  C: days 0..5  -> T=5, death     D: days 0..10 -> T=10, censored
    //  E: day 3..10  -> T=7, censored(last=10)   F: day 0..4 -> T=4, death
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (2L, "2024-01-03"),
      (3L, "2024-01-01"), (3L, "2024-01-06"),
      (4L, "2024-01-01"), (4L, "2024-01-11"),
      (5L, "2024-01-04"), (5L, "2024-01-11"),
      (6L, "2024-01-01"), (6L, "2024-01-05"))
      .toDF("user_id", "d").withColumn("ts", to_timestamp(col("d")))
    val out = Extensions37.kaplanMeier(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // T=2: n=6, d=2 -> S = 4/6 = .6667 ; T=4: n=4, d=1 -> S *= 3/4 = .5
    // T=5: n=3, d=1 -> S *= 2/3 = .3333 ; T=7: n=2, c=1 -> S unchanged
    // T=10: n=1, c=1 -> unchanged
    assert(out(2L) == ((6L, 2L, 0L, 0.6667)))
    assert(out(4L) == ((4L, 1L, 0L, 0.5)))
    assert(out(5L) == ((3L, 1L, 0L, 0.3333)))
    assert(out(7L) == ((2L, 0L, 1L, 0.3333)), "censoring must not move the curve")
    assert(out(10L) == ((1L, 0L, 1L, 0.3333)))
  }

  test("x112 all-die boundary: the curve reaches exactly 0 without NULL/Inf divergence") {
    import spark.implicits._
    val ev2 = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-01"), (3L, "2024-01-03"),
      (4L, "2024-01-01"), (4L, "2024-01-04"))
      .toDF("user_id", "d").withColumn("ts", to_timestamp(col("d")))
    // horizon Jan 4: subjects 1,2 die at T=1; 3 dies at T=2; 4 censored
    val out = Extensions37.kaplanMeier(ev2, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) == 0.5)      // 4 at risk, 2 die
    assert(out(2L) == 0.25)     // 2 at risk, 1 dies
    // a graph where the LAST risk set dies entirely: an early-starting
    // subject out-lives the horizon-censored one and then dies (d = n)
    val allDie = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (9L, "2024-01-05"), (9L, "2024-01-09"),
      (7L, "2023-12-30"), (7L, "2024-01-08"))
      .toDF("user_id", "d").withColumn("ts", to_timestamp(col("d")))
    // horizon Jan 9: T=1 n=4 d=2 -> 0.5; T=4 censored -> 0.5;
    // T=9 n=1 d=1 -> the reached-zero flag, S = exactly 0
    val a = Extensions37.kaplanMeier(allDie, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(a(1L) == 0.5 && a(4L) == 0.5)
    assert(a(9L) == 0.0, s"d = n must hit exactly 0, not NULL/-Inf: $a")
  }

  test("x112 fixture: risk sets are monotone non-increasing, survival monotone non-increasing from 1") {
    val rows = SparkEntry.queries("x112_survival")(spark, sf0001)
      .orderBy(col("t_days")).collect()
    assert(rows.nonEmpty)
    var lastRisk = Long.MaxValue
    var lastS = 1.0
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getDouble(4))
      assert(n <= lastRisk, s"risk set must shrink: $r")
      assert(s <= lastS + 1e-9 && s >= 0.0 && s <= 1.0, s"survival monotone: $r")
      lastRisk = n; lastS = s
    }
  }
}
