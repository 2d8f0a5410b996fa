package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions94

/** Batch-94 invariants: the skew planner predicts the planted
  * fan-out and sizes salt to it; the savings card prices each funnel
  * stage exactly; the length fit reads a planted lognormal.
  */
class Extensions94Spec extends SparkSpec {

  test("x215 planted: hub key's predicted fan-out = cl*cr, flagged hot, salt ~ share/mean; uniform keys cold") {
    import spark.implicits._
    val left = ((1 to 90).map(_ => 1L) ++ (2L to 10L)).toDF("k")
    val right = ((1 to 80).map(_ => 1L) ++ (2L to 10L)).toDF("k")
    val out = Extensions94.joinSkewPlanner(left, right, "k")
      .collect().map(r => r.getLong(0) -> r).toMap
    val hub = out(1L)
    assert(hub.getLong(3) == 90L * 80L)
    assert(hub.getBoolean(5), s"hub must flag hot: $hub")
    // mean = (7200 + 9)/10 = 721 (rounded 721); share/mean = 7200*10/7209 ~ 9.99 -> 10
    assert(hub.getLong(6) == 10L, s"salt sized to the fan-out share: $hub")
    assert(out(2L).getLong(3) == 1L && !out(2L).getBoolean(5))
    assert(out(2L).getLong(6) == 1L)
  }

  test("x216 planted: exact stage prices the byte-identical copy, near stage the near-copy") {
    import spark.implicits._
    val stem = "the quick brown fox jumps over the lazy dog while the slow red hen watches from the old wooden"
    val corpus = Seq(
      (1L, s"$stem fence"),   // 100 bytes-ish original
      (2L, s"$stem fence"),   // exact copy -> exact stage drops
      (3L, s"$stem gate"),    // near copy -> near stage drops
      (4L, "totally different short content"))
      .toDF("doc_id", "text")
    val r = Extensions94.dedupSavingsCard(corpus, "doc_id", "text").collect().head
    val b1 = (stem + " fence").length.toLong
    val b3 = (stem + " gate").length.toLong
    val b4 = "totally different short content".length.toLong
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 2 * b1 + b3 + b4)
    assert(r.getLong(2) == b1 + b3 + b4, s"exact stage drops one copy: $r")
    assert(r.getLong(3) == b1 + b4, s"near stage drops the near-copy: $r")
    assert(r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0)
  }

  test("x217 planted: an exact two-point length distribution fits its own moments; tail count exact") {
    import spark.implicits._
    // lengths e^5 ~ 148 and e^7 ~ 1097 in equal measure: mu = 6, sigma
    // ~ 1.0003 (ln quantized at 1e-4); p99 = e^{6+2.3263*sigma} ~ 4150
    // -> nothing beyond it
    val df = ((1 to 50).map(_ => 148L) ++ (1 to 50).map(_ => 1097L)).toDF("len")
    val r = Extensions94.lognormalLengthFit(df, "len").collect().head
    assert(r.getLong(0) == 100L)
    assert(math.abs(r.getDouble(1) - 6.0) < 0.01, s"mu ~ 6: $r")
    assert(math.abs(r.getDouble(2) - 1.0) < 0.01, s"sigma ~ 1: $r")
    assert(r.getLong(5) == 0L && r.getDouble(6) == 0.0)
    // planted heavy tail: 5 docs at e^12 land far beyond the fitted p99
    val heavy = df.unionAll((1 to 5).map(_ => 162755L).toDF("len"))
    val h = Extensions94.lognormalLengthFit(heavy, "len").collect().head
    assert(h.getLong(5) == 5L, s"tail rows counted exactly: $h")
  }
}
