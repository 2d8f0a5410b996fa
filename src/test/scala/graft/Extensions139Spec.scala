package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions139

/** Batch-139 invariants: Min-K% scores a rare-token document above an
  * all-common one and matches a hand-computed tail mean; the
  * alignment/uniformity card prefers clustered-by-label geometry on
  * alignment and separates the degenerate all-equal case.
  */
class Extensions139Spec extends SparkSpec {

  test("minKProb: rare-token doc scores higher; hand-computed tail mean") {
    import spark.implicits._
    // corpus: 'a' x 18 tokens, 'z' x 2 tokens (T=20)
    // doc 1 = 10 a's: surprisal(a) = ln(20/18); k = 2 -> mean = ln(10/9)
    // doc 2 = 8 a's + 2 z's: tail of 2 = two z's: mean = ln(10)
    val docs = Seq(
      (1L, Seq.fill(10)("a").mkString(" ")),
      (2L, (Seq.fill(8)("a") ++ Seq.fill(2)("z")).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Extensions139.minKProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lnA = Math.round(1e6 * math.log(20.0 / 18.0))
    val lnZ = Math.round(1e6 * math.log(20.0 / 2.0))
    assert(got(1L) == ((10L, lnA)), s"all-common doc: $got vs $lnA")
    assert(got(2L) == ((10L, lnZ)), s"rare tail dominates: $got vs $lnZ")
    assert(got(2L)._2 > got(1L)._2, "rare-token doc must score higher")
  }

  test("alignmentUniformity: label-clustered beats label-shuffled on alignment") {
    import spark.implicits._
    // two tight clusters far apart; labels match clusters vs alternate
    def emb(labelByCluster: Boolean) = (0 until 40).map { i =>
      val cluster = i % 2
      val base = if (cluster == 0) 0.0f else 3.0f
      val lb = if (labelByCluster) cluster else i % 4 / 2 // shuffles half
      (i.toLong, Array(base + (i / 2) * 1e-4f, base), lb)
    }.toDF("vec_id", "embedding", "label")
    val good = Extensions139.alignmentUniformity(
      emb(true), "vec_id", "embedding", "label").head
    val bad = Extensions139.alignmentUniformity(
      emb(false), "vec_id", "embedding", "label").head
    assert(good.getLong(2) < bad.getLong(2),
      s"label-aligned clusters have smaller same-label distance: " +
        s"${good.getLong(2)} vs ${bad.getLong(2)}")
    assert(good.getLong(1) == 40L * 39 / 2, s"all sample pairs counted: $good")
  }

  test("x316/x317 fixtures run with sane ranges") {
    val mk = SparkEntry.queries("x316_min_k_prob")(spark, sf0001).collect()
    assert(mk.nonEmpty && mk.forall(_.getLong(2) > 0L))
    val au = SparkEntry.queries("x317_align_uniformity")(spark, sf0001).head
    assert(au.getLong(0) > 0L && au.getLong(1) > au.getLong(0))
    assert(au.getLong(2) > 0L, s"distinct embeddings: $au")
    assert(au.getLong(3) <= 0L, s"uniformity is a log-mean-exp of <= 1: $au")
  }
}
