package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions103

/** Batch-103 invariants: containment surfaces the doc-inside-doc pairs
  * the Jaccard chain under-scores.
  */
class Extensions103Spec extends SparkSpec {

  test("containment finds the planted doc-inside-doc pair that Jaccard under-scores") {
    import spark.implicits._
    val inner = (1 to 12).map(i => s"tok$i").mkString(" ")
    val host = "unrelated preamble goes here first " + inner +
      " " + (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, inner), (2L, host),
      (3L, "completely different content with no overlap at all in any window"))
      .toDF("doc_id", "text")
    val got = Extensions103.containmentPairs(df, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L, s"${got.mkString(",")}")
    assert(got.head._4 == 1.0, s"full inclusion -> containment 1: ${got.head}")
    assert(got.head._3 < 0.5, s"the same pair must be under Jaccard's usual bar: ${got.head}")
  }

  test("x234 fixture: sane shape") {
    val c = SparkEntry.queries("x234_containment_pairs")(spark, sf0001).collect()
    assert(c.nonEmpty, "the planted hosts must pair with their sources")
    // every planted host contains its source doc fully
    assert(c.exists(r => r.getLong(1) == r.getLong(0) + 100000L && r.getDouble(3) == 1.0),
      s"host pairs expected: ${c.take(5).mkString(",")}")
  }
}
