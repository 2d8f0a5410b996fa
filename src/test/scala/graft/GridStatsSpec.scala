package graft

import org.apache.spark.sql.functions._
import graft.ops.GridStats

/** Unit contracts for the round-14 shared grid kernels — values checked
  * against hand-computed references so the oracle queries sitting on top
  * of them cannot drift silently.
  */
class GridStatsSpec extends SparkSpec {
  import spark.implicits._

  test("withBelow: global exclusive prefix matches a hand-built reference") {
    val grid = Seq((10L, 3L), (20L, 2L), (30L, 5L), (40L, 1L))
      .toDF("v", "c")
    val got = GridStats.withBelow(grid, Seq.empty, "v", Seq("c"))
      .select(col("v"), col("below_c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 0L, 20L -> 3L, 30L -> 5L, 40L -> 10L))
  }

  test("withBelow: grouped prefix restarts per group, multi-count in one pass") {
    val grid = Seq(
      ("a", 1L, 2L, 1L), ("a", 2L, 3L, 0L), ("b", 1L, 4L, 2L),
      ("b", 5L, 1L, 1L), ("c", 9L, 7L, 7L))
      .toDF("g", "v", "c1", "c2")
    val got = GridStats.withBelow(grid, Seq("g"), "v", Seq("c1", "c2"))
      .select(col("g"), col("v"), col("below_c1"), col("below_c2"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", 1L) -> (0L, 0L), ("a", 2L) -> (2L, 1L),
      ("b", 1L) -> (0L, 0L), ("b", 5L) -> (4L, 2L),
      ("c", 9L) -> (0L, 0L)))
  }

  test("permilleCuts: exact order statistics off the grid") {
    // 10 values 1..10 (count 1 each): p10 -> k=1 -> v=1; p50 -> k=5 -> 5;
    // p990 -> k=ceil(9.9)=10 -> 10
    val grid = (1L to 10L).map(v => (v, 1L)).toDF("v", "c")
    val row = GridStats.permilleCuts(grid, "v", "c",
      Seq("lo" -> 100, "mid" -> 500, "hi" -> 990)).collect()(0)
    assert(row.getLong(0) == 10L)
    assert(row.getLong(row.fieldIndex("lo")) == 1L)
    assert(row.getLong(row.fieldIndex("mid")) == 5L)
    assert(row.getLong(row.fieldIndex("hi")) == 10L)
  }

  test("conformalQhat: k-th smallest with ties; NULL when unrealizable") {
    // scores 1,1,2,3 (n=4): level 500 -> k = ceil(5*0.5)=3 -> qhat=2;
    // level 990 -> k = ceil(4.95)=5 > 4 -> NULL
    val grid = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("s", "cnt")
    val rows = GridStats.conformalQhat(grid, "s", "cnt", Seq(500, 990))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(r.fieldIndex("qhat"))) None
        else Some(r.getLong(r.fieldIndex("qhat"))))).toMap
    assert(rows(500L) == Some(2L))
    assert(rows(990L) == None)
  }

  test("bhStepUp: step-up cutoff marks every rank at or below i*") {
    // p (micro) = 10, 30, 200, 900 over m=4 at alpha=50 permille:
    // accept i iff p*4*1000 <= 50*i*1e6 -> p <= 12500*i: ranks 1,2,3
    // accept, rank 4 (p=900000? no: 900) ... use values that cross
    val df = Seq(("a", 10000L), ("b", 30000L), ("c", 200000L),
      ("d", 900000L)).toDF("k", "p")
    val got = GridStats.bhStepUp(df, "k", "p",
        (p, m, rk) => p * m * 1000L <= rk * 50L * 1000000L)
      .select(col("k"), col("rk"), col("rejected"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._2)
    // thresholds: rank i accepts when p <= 12500*i micro:
    // r1 p=10000 <= 12500 ok; r2 p=30000 > 25000 no; r3 p=200000 >
    // 37500 no; r4 p=900000 > 50000 no -> i*=1, only rank 1 rejected
    assert(got.map(_._1).toSeq == Seq("a", "b", "c", "d"))
    assert(got.map(_._3).toSeq == Seq(true, false, false, false))
  }

  test("bhStepUp: no discoveries -> rejected all-false, not null") {
    val df = Seq(("a", 900000L), ("b", 950000L)).toDF("k", "p")
    val got = GridStats.bhStepUp(df, "k", "p",
        (p, m, rk) => p * m * 1000L <= rk * 50L * 1000000L)
      .select(col("rejected")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(false, false))
  }
}
