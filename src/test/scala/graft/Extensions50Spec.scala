package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions50

/** Batch-50 invariants: RBO_EXT endpoints and a hand-computed middle
  * value; assortativity at its exact extremes; modularity/conductance
  * on partitions with known closed-form scores.
  */
class Extensions50Spec extends SparkSpec {

  private def ranking(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("q_id", "c_id", "rk")
  }

  test("x131 planted: identical lists read exactly 1.0; disjoint lists 0.0") {
    val a = ranking(Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L)))
    val same = Extensions50.rankBiasedOverlap(a, a, k = 3).collect()
    assert(same.head.getDouble(1) == 1.0 && same.head.getDouble(2) == 1.0)
    val b = ranking(Seq((0L, 20L, 1L), (0L, 21L, 2L), (0L, 22L, 3L)))
    val none = Extensions50.rankBiasedOverlap(a, b, k = 3).collect()
    assert(none.head.getDouble(1) == 0.0)
  }

  test("x131 planted: swapped top-2 gives the hand-computed 0.9") {
    val a = ranking(Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
    val b = ranking(Seq((0L, 2L, 1L), (0L, 1L, 2L), (0L, 3L, 3L)))
    // inter = (0, 2, 3); weights (0.1, 0.09, 0.81) -> 0.09 + 0.81 = 0.9
    val out = Extensions50.rankBiasedOverlap(a, b, k = 3).collect()
    assert(out.head.getDouble(1) == 0.9, s"got $out")
  }

  test("x131 fixture: values bounded; mean is the average") {
    val out = SparkEntry.queries("x131_rbo")(spark, sf0001).collect()
    assert(out.length == 5)
    val vals = out.map(_.getDouble(1))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
    val mean = out.head.getDouble(2)
    assert(math.abs(mean - vals.sum / vals.length) < 5e-4)
  }

  test("x132 planted: a star is perfectly disassortative (r = -1)") {
    import spark.implicits._
    val star = (1L to 4L).map(i => (0L, i)).toDF("a", "b")
    val r = Extensions50.assortativity(star, "a", "b").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == -1.0)
  }

  test("x132 planted: a degree-regular graph has undefined assortativity (NULL)") {
    import spark.implicits._
    val matching = Seq((0L, 1L), (2L, 3L)).toDF("a", "b")
    val r = Extensions50.assortativity(matching, "a", "b").collect().head
    assert(r.isNullAt(2), "zero degree variance -> NULL, not a crash")
  }

  test("x132 fixture: coefficient within [-1, 1]") {
    val r = SparkEntry.queries("x132_assortativity")(spark, sf0001)
      .collect().head
    val v = r.getDouble(2)
    assert(v >= -1.0 && v <= 1.0, s"r = $v")
  }

  test("x133 planted: two clean triangles -> modularity 0.5, conductance 0") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val labels = Seq(0L -> 1L, 1L -> 1L, 2L -> 1L, 10L -> 2L, 11L -> 2L, 12L -> 2L)
      .toDF("node", "community")
    val out = Extensions50.communityMetrics(edges, labels, "a", "b",
      "node", "community").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 6L)
      assert(r.getDouble(4) == 0.0, s"no cut edges: $r")
      assert(r.getDouble(5) == 0.5, s"modularity of the clean 2-split: $r")
    }
  }

  test("x133 planted: the trivial one-community partition scores 0") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val labels = Seq(0L, 1L, 2L, 10L, 11L, 12L).map(_ -> 9L)
      .toDF("node", "community")
    val out = Extensions50.communityMetrics(edges, labels, "a", "b",
      "node", "community").collect()
    assert(out.length == 1)
    assert(out.head.getDouble(5) == 0.0, "Q of everything-together is 0")
    assert(out.head.isNullAt(4), "whole-graph conductance denominator is 0 -> NULL")
  }

  test("x133 fixture: accounting — internal edges within degree budget, Q constant") {
    val out = SparkEntry.queries("x133_community_metrics")(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getDouble(5)).distinct.length == 1, "Q is partition-wide")
    out.foreach { r =>
      assert(2L * r.getLong(2) <= r.getLong(3),
        s"2·internal <= degree sum: $r")
    }
  }
}
