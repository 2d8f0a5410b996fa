package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions96

/** Batch-96 invariants: the radius curve is monotone and saturates on
  * planted identical docs at radius 0; the estimator card reads zero
  * error on identical docs and bounded error on the fixture.
  */
class Extensions96Spec extends SparkSpec {

  test("x220 planted: identical docs recall at radius 0; curve monotone in radius") {
    import spark.implicits._
    def run(off: Int) = (off until off + 40).map(i => s"t${i % 90}").mkString(" ")
    val corpus = Seq(
      (1L, run(0)), (2L, run(0)),          // identical pair -> hamming 0
      (10L, run(30)), (11L, run(30)),      // identical pair
      (20L, run(60)))                       // singleton
      .toDF("doc_id", "text")
    val out = Extensions96.simhashRadiusCurve(corpus, "doc_id", "text",
        threshold = 0.9, maxRadius = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0L)._1 == 2L && out(0L)._2 == 2L && out(0L)._3 == 1.0,
      s"identical docs are hamming-0: $out")
    val recalls = (0L to 4L).map(r => out(r)._3)
    assert(recalls == recalls.sorted, s"recall must be monotone: $recalls")
  }

  test("x221 planted: identical docs read zero estimator error; fixture error bounded") {
    import spark.implicits._
    def run(off: Int) = (off until off + 40).map(i => s"t${i % 90}").mkString(" ")
    val corpus = Seq((1L, run(0)), (2L, run(0)), (3L, run(50)))
      .toDF("doc_id", "text")
    val r = Extensions96.minhashErrorCard(corpus, "doc_id", "text", threshold = 0.9)
      .collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 1.0,
      s"identical docs: est = exact = 1: $r")
    // fixture: 32 permutations keep most pairs within 0.2 absolute
    val f = SparkEntry.queries("x221_minhash_error")(spark, sf0001).collect().head
    assert(f.getLong(0) > 0L)
    assert(f.getDouble(2) <= 0.35, s"32-perm max error should stay bounded: $f")
  }
}
