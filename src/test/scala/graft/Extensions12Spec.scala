package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions12

/** Semantic invariants for the batch-12 operators (x62-x63). */
class Extensions12Spec extends SparkSpec {

  test("rrfFuse ranks a doc found by both lists above docs found by one") {
    import spark.implicits._
    val listA = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("q_id", "c_id", "rk")
    val listB = Seq((1L, 100L, 2L), (1L, 102L, 1L)).toDF("q_id", "c_id", "rk")
    val fused = Extensions12.rrfFuse(Seq(listA, listB), k = 3).collect()
    // 100 appears in both (1/61 + 1/62) > any single-list contribution (1/61)
    assert(fused.head.getAs[Long]("c_id") == 100L, "both-lists doc must win")
    assert(fused.head.getAs[Long]("n_lists") == 2L)
    // rank-1 single-list docs beat nothing else: 102 (rk1 in B) above 101 (rk2 in A)
    val order = fused.map(_.getAs[Long]("c_id")).toSeq
    assert(order == Seq(100L, 102L, 101L), s"got $order")
  }

  test("rankingAgreement is 1.0 for identical rankings, 0 for disjoint, asymmetric-safe") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)).toDF("q_id", "c_id", "rk")
    val same = Extensions12.rankingAgreement(a, a, k = 3).collect().head
    assert(same.getAs[Double]("avg_overlap") == 1.0,
      s"self-agreement must be 1.0, got $same")
    val disjoint = Seq((1L, 20L, 1L), (1L, 21L, 2L), (1L, 22L, 3L)).toDF("q_id", "c_id", "rk")
    val zero = Extensions12.rankingAgreement(a, disjoint, k = 3).collect().head
    assert(zero.getAs[Double]("avg_overlap") == 0.0 && zero.getAs[Long]("n_common") == 0L,
      "disjoint rankings must report 0, not vanish")
    // same SET, reversed order: overlap strictly between 0 and 1
    val rev = Seq((1L, 12L, 1L), (1L, 11L, 2L), (1L, 10L, 3L)).toDF("q_id", "c_id", "rk")
    val partial = Extensions12.rankingAgreement(a, rev, k = 3).collect().head
    val ao = partial.getAs[Double]("avg_overlap")
    assert(ao > 0.0 && ao < 1.0, s"reversed order must score in (0,1), got $ao")
  }

  test("x62 hybrid fusion emits a full top-5 per query with deterministic tie order") {
    val rows = Extensions12.x62HybridRrf(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 5),
      "each of the 5 queries must fuse to a full top-5")
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      sorted.sliding(2).foreach { case Array(x, y) =>
        val (rx, ry) = (x.getAs[Double]("rrf"), y.getAs[Double]("rrf"))
        assert(rx > ry || (rx == ry && x.getAs[Long]("c_id") < y.getAs[Long]("c_id")),
          "fused order must be (rrf desc, c_id asc)")
      }
    }
  }
}
