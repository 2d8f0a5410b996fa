package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions103

/** Batch-103 invariants: the weighted sampler is deterministic and
  * weight-monotone; containment surfaces the doc-inside-doc pairs the
  * Jaccard chain under-scores.
  */
class Extensions103Spec extends SparkSpec {

  test("weightedSample: deterministic, k rows, and heavier docs oversampled") {
    import spark.implicits._
    // 200 light docs (w=10) and 200 heavy docs (w=1000)
    val df = ((1 to 200).map(i => (i.toLong, 10L)) ++
      (201 to 400).map(i => (i.toLong, 1000L))).toDF("doc_id", "w")
    val s1 = Extensions103.weightedSample(df, "doc_id", "w", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Extensions103.weightedSample(df, "doc_id", "w", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same input -> same sample")
    assert(s1.size == 100)
    val heavy = s1.count(_ > 200)
    assert(heavy > 70,
      s"100x weight must dominate the sample (A-ES property): $heavy/100 heavy")
  }

  test("weightedSample: zero/negative weights excluded; k > n returns all positive-weight rows") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 0L), (3L, -2L), (4L, 7L)).toDF("doc_id", "w")
    val got = Extensions103.weightedSample(df, "doc_id", "w", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L), s"$got")
  }

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

  test("x233/x234 fixtures: sane shapes") {
    val s = SparkEntry.queries("x233_weighted_sample")(spark, sf0001).collect()
    assert(s.length == 50 && s.map(_.getLong(0)).distinct.length == 50)
    val c = SparkEntry.queries("x234_containment_pairs")(spark, sf0001).collect()
    assert(c.nonEmpty, "the planted hosts must pair with their sources")
    // every planted host contains its source doc fully
    assert(c.exists(r => r.getLong(1) == r.getLong(0) + 100000L && r.getDouble(3) == 1.0),
      s"host pairs expected: ${c.take(5).mkString(",")}")
  }
}
