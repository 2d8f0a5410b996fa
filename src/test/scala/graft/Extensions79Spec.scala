package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions79

/** Batch-79 invariants: the ACF reads a planted alternation as
  * r1 ~ -1 (significant, huge Q); turning points count a monotone
  * ramp at zero and a perfect alternation at the maximum.
  */
class Extensions79Spec extends SparkSpec {

  private def series(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (f"2024-03-${i + 1}%02d 12:00:00", v)
    }.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
  }

  test("x190 planted: a daily alternation reads r1 ~ -1, significant, big Q") {
    val alt = (0 until 20).map(i => if (i % 2 == 0) 10.0 else 30.0)
    val out = Extensions79.acfTable(series(alt), "ts", "value", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) < -0.9, s"alternation: r1 ~ -1: ${out(1L)}")
    assert(out(1L).getBoolean(3), "strongly significant")
    assert(out(2L).getDouble(2) > 0.8, "lag 2 back in phase")
    assert(out(1L).getDouble(4) == out(3L).getDouble(4),
      "Q repeats on every row")
    assert(out(1L).getDouble(4) > 10.0, s"portmanteau fires: ${out(1L)}")
  }

  test("x191 planted: a monotone ramp has zero turns; an alternation turns everywhere") {
    val ramp = (0 until 15).map(i => 10.0 + i)
    val r1 = Extensions79.turningPointTest(series(ramp), "ts", "value")
      .collect().head
    assert(r1.getLong(1) == 0L, s"monotone -> no turning points: $r1")
    assert(r1.getDouble(3) < -4.0, "far below the i.i.d. expectation")
    val alt = (0 until 15).map(i => if (i % 2 == 0) 1.0 else 9.0)
    val r2 = Extensions79.turningPointTest(series(alt), "ts", "value")
      .collect().head
    assert(r2.getLong(1) == 13L, s"every interior point turns: $r2")
    assert(r2.getDouble(3) > 2.0)
  }

  test("x190/x191 fixtures: bounded r, Q consistent; turning stats sane") {
    val acf = SparkEntry.queries("x190_acf")(spark, sf0001).collect()
    assert(acf.length == 6)
    acf.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val tp = SparkEntry.queries("x191_turning_points")(spark, sf0001)
      .collect().head
    assert(tp.getLong(0) == 30L)
    assert(tp.getLong(1) <= 28L)
  }
}
