package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions99

/** Batch-99 invariants: the cosine curve is monotone non-increasing in
  * the threshold and catches planted identical vectors at 1.0; the
  * transitivity audit reads a planted closed triangle and open wedge
  * exactly.
  */
class Extensions99Spec extends SparkSpec {

  test("x226 planted: identical vectors pair at every threshold; counts monotone non-increasing") {
    import spark.implicits._
    val v1 = (1 to 8).map(i => 0.1f * i).toArray
    val v2 = v1.map(x => x * 2.0f)             // same direction -> cos 1
    val v3 = (1 to 8).map(i => if (i % 2 == 0) 0.5f else 0.4f).toArray
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val out = Extensions99.cosineThresholdCurve(df, "vec_id", "embedding",
        signBits = 2, thresholds = Seq(0.5, 0.9, 0.9999))
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    assert(out(0.9999) >= 1L, s"the colinear pair must survive every threshold: $out")
    val counts = Seq(0.5, 0.9, 0.9999).map(out)
    assert(counts == counts.sorted.reverse, s"monotone non-increasing: $counts")
  }

  test("x227 planted: one closed triangle + one open wedge reads closure 1/2") {
    import spark.implicits._
    // docs 1,2,3 identical (closed triangle); 10-11-12 a chain where
    // A~B (22-token shared prefix -> jac 18/34 = 0.53) and B~C
    // (22-token shared suffix) but A!~C (14 shared mid-tokens -> jac
    // 10/42 = 0.24 < 0.5): one open wedge
    val tri = (0 until 30).map(i => s"w$i").mkString(" ")
    val t = (0 until 30).map(i => s"t$i")
    val chainA = t.mkString(" ")
    val chainB = (t.take(22) ++ (0 until 8).map(i => s"b$i")).mkString(" ")
    val chainC = ((0 until 8).map(i => s"c$i") ++ t.slice(8, 22) ++
      (0 until 8).map(i => s"b$i")).mkString(" ")
    val corpus = Seq(
      (1L, tri), (2L, tri), (3L, tri),
      (10L, chainA), (11L, chainB), (12L, chainC))
      .toDF("doc_id", "text")
    val r = Extensions99.dupTransitivityAudit(corpus, "doc_id", "text",
      threshold = 0.5).collect().head
    // triangle contributes 3 closed wedges (one per middle node);
    // the chain contributes 1 open wedge (middle 11)
    assert(r.getLong(0) == 5L, s"pairs: $r")      // 3 triangle + 2 chain
    assert(r.getLong(1) == 4L, s"wedges: $r")
    assert(r.getLong(2) == 3L, s"closed: $r")
    assert(r.getDouble(3) == 0.75, s"closure share: $r")
  }
}
