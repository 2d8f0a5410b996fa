package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions66

/** Batch-66 invariants: BFS reach counts a planted chain one hop at a
  * time and saturates exactly; the label-noise queue ranks the most
  * confident disagreement first and ignores agreements.
  */
class Extensions66Spec extends SparkSpec {

  test("x164 planted: a chain is reached one node per hop; saturation empties the frontier") {
    import spark.implicits._
    // chain 1 -> 2 -> 3 -> 4 (directed)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = Extensions66.khopReach(edges, "src", "dst", seeds, "node", 5)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1)
    (1 to 3).foreach { h =>
      assert(out(h).getLong(1) == 1 && out(h).getLong(2) == (h + 1).toLong,
        s"hop $h reaches exactly one new node: ${out(h)}")
    }
    assert(out(4).getLong(1) == 0 && out(4).getLong(2) == 4,
      "saturated: empty frontier, stable total")
    assert(out(5).getLong(1) == 0)
  }

  test("x164 planted: a star saturates in one hop") {
    import spark.implicits._
    val edges = (2L to 6L).map(d => (1L, d)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = Extensions66.khopReach(edges, "src", "dst", seeds, "node", 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(1) == 5 && out(1).getLong(2) == 6)
    assert(out(2).getLong(1) == 0)
  }

  test("x165 planted: confident disagreements rank first; agreements never appear") {
    import spark.implicits._
    val scored = Seq(
      (1L, 1L, 5000000L),    // agrees (pred keep, label keep)
      (2L, 0L, 4000000L),    // disagrees, confident
      (3L, 1L, -100000L),    // disagrees, mild
      (4L, 0L, -3000000L))   // agrees
      .toDF("doc_id", "label", "margin_micro")
    val out = Extensions66.labelNoiseSuspects(scored, "doc_id",
      "margin_micro", "label", topK = 10).collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L && out(0).getLong(0) == 1L,
      s"most confident contradiction first: ${out.toSeq}")
    assert(out(1).getLong(1) == 3L)
    assert(out.forall(r => Set(2L, 3L)(r.getLong(1))), "agreements excluded")
  }

  test("x164/x165 fixtures: dense graph saturates fast; the relabel queue is non-empty") {
    val reach = SparkEntry.queries("x164_khop_reach")(spark, sf0001).collect()
    assert(reach.length == 5)
    val totals = reach.map(_.getLong(2)).toSeq
    assert(totals.zip(totals.tail).forall { case (a, b) => b >= a })
    assert(totals.last > totals.head, "the purchase graph reaches beyond the seeds")
    val noise = SparkEntry.queries("x165_label_noise")(spark, sf0001).collect()
    assert(noise.nonEmpty && noise.length <= 20)
    val margins = noise.map(r => math.abs(r.getLong(3)))
    assert(margins.zip(margins.tail).forall { case (a, b) => a >= b },
      "queue ordered by confidence")
  }
}
