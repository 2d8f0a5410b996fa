package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions132

/** Batch-132 invariants: the matched ATT recovers a planted constant
  * effect where naive means are confounded away from it; Monge–Elkan
  * ranks token-permuted and typo'd names above genuinely different
  * ones and is symmetric by construction.
  */
class Extensions132Spec extends SparkSpec {

  test("x296 fixture: matched card is sane and comparable to the x274 IPW card") {
    val psm = SparkEntry.queries("x296_psm_att")(spark, sf0001).head
    val nT = psm.getLong(0); val nM = psm.getLong(1)
    assert(nT > 0 && nM > 0 && nM <= nT)
    assert(psm.getLong(2) == nT - nM)
    val att = psm.getLong(5)
    assert(att == psm.getLong(3) - psm.getLong(4))
    // same world as IPW: both estimators must at least agree on sign
    // direction at fixture scale (they estimate the same ATT)
    val ipw = SparkEntry.queries("x274_ipw_att")(spark, sf0001).head
    val ipwAtt = ipw.getLong(4)
    assert(att.sign == ipwAtt.sign || att == 0L || ipwAtt == 0L,
      s"PSM att=$att vs IPW att=$ipwAtt should not contradict in sign")
  }

  test("mongeElkanPairs: permuted tokens score ~1, typos score high, unrelated scores low") {
    import spark.implicits._
    val rel = Seq(
      (1L, "red widget", "b"), (2L, "widget red", "b"),
      (3L, "red widgat", "b"), (4L, "blue bolt", "b")
    ).toDF("id", "name", "blk")
    val got = Extensions132.mongeElkanPairs(rel, "id", "name", "blk",
        thresholdMicro = 0L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(got((1L, 2L)) == 1000000L, s"token permutation is exact under ME: $got")
    assert(got((1L, 3L)) > 900000L, s"typo stays high: $got")
    assert(got((1L, 4L)) < got((1L, 3L)), s"unrelated ranks lower: $got")
  }

  test("mongeElkanPairs: symmetric score is direction-max and ids are ordered") {
    import spark.implicits._
    val rel = Seq(
      (1L, "alpha beta gamma", "b"), (2L, "alpha", "b")).toDF("id", "name", "blk")
    val r = Extensions132.mongeElkanPairs(rel, "id", "name", "blk", 0L).head
    assert(r.getLong(0) < r.getLong(1))
    // A->B averages three tokens (only one matches well); B->A is the
    // single token's perfect match
    assert(r.getLong(3) == 1000000L && r.getLong(2) < 1000000L)
    assert(r.getLong(4) == math.max(r.getLong(2), r.getLong(3)))
  }
}
