package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions97

/** Batch-97 invariants: the sketch card's tolerance flag is honest
  * (exact values pinned, sketch audited), the decile table reads a
  * planted uniform grid exactly.
  */
class Extensions97Spec extends SparkSpec {

  test("x222 planted: exact percentiles of a known grid; sketch lands in tolerance") {
    import spark.implicits._
    // values 1..100 in one group: p50 = 50.5, p90 = 90.1, p99 = 99.01
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val r = Extensions97.approxQuantileCard(df, "g", "v").collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 50.5 && r.getDouble(3) == 90.1 && r.getDouble(4) == 99.01)
    assert(r.getBoolean(5), s"GK sketch at accuracy 10000 must sit in tolerance: $r")
  }

  test("x223 planted: deciles of 1..100 are the interpolated grid points") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val out = Extensions97.groupDeciles(df, "g", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // percentile_cont over 1..100: q_k = 1 + 99*k/10
    (1 to 9).foreach { k =>
      val expect = 1.0 + 99.0 * k / 10.0
      assert(math.abs(out(k.toLong) - expect) < 1e-9, s"decile $k: ${out(k.toLong)} vs $expect")
    }
  }
}
