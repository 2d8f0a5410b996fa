package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions30

/** Batch-30 invariants beyond the value-level oracles. */
class Extensions30Spec extends SparkSpec {

  test("x100 planted communities: two cliques with one weak bridge separate; labels are deterministic") {
    import spark.implicits._
    // clique A on 1..5, clique B on 11..15, one bridge 5-11
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L))
      .toDF("a", "b")
    val comm = Extensions30.labelPropagation(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aLabels = (1L to 5L).map(comm).toSet
    val bLabels = (11L to 15L).map(comm).toSet
    assert(aLabels.size == 1, s"clique A must agree on one community: $aLabels")
    assert(bLabels.size == 1, s"clique B must agree on one community: $bLabels")
    assert(aLabels != bLabels, "the weak bridge must not merge the cliques")
    val again = Extensions30.labelPropagation(edges.repartition(5), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comm == again, "synchronous LPA with fixed rounds is deterministic")
  }

  test("x100 fixture: every node gets exactly one community; sizes sum to node count") {
    val out = SparkEntry.queries("x100_communities")(spark, sf0001)
    val n = out.count()
    assert(out.select("node").distinct().count() == n)
    val nodes = out.select("node").collect().map(_.getLong(0)).toSet
    assert(nodes.exists(_ >= 10000000L) && nodes.exists(_ < 10000000L),
      "both customer and supplier nodes must be labeled")
  }

  test("x101 collapsed embeddings read anisotropy ~1; spread embeddings read ~0") {
    import spark.implicits._
    // collapsed: every vector identical; spread: +/- pairs cancel
    val base = (0 until 64).map(i => 0.1f)
    val collapsed = (1L to 20L).map(i => (0L, base)).toDF("label", "embedding")
    val spread = (1L to 20L).map(i =>
      (0L, (0 until 64).map(d => if (i % 2 == 0) 0.1f else -0.1f)))
      .toDF("label", "embedding")
    val cA = Extensions30.embeddingHealth(collapsed, "label", "embedding")
      .head().getAs[Double]("anisotropy")
    val sA = Extensions30.embeddingHealth(spread, "label", "embedding")
      .head().getAs[Double]("anisotropy")
    assert(math.abs(cA - 1.0) < 1e-9, s"identical vectors: anisotropy $cA must be 1")
    assert(math.abs(sA) < 0.1, s"cancelling vectors: anisotropy $sA must be ~0")
  }

  test("x101 fixture: mean_sq_norm positive, anisotropy in [-1, 1], one row per label") {
    val out = SparkEntry.queries("x101_embedding_health")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_sq_norm") > 0)
      val a = r.getAs[Double]("anisotropy")
      assert(a >= -1.0 && a <= 1.0, s"anisotropy $a out of range")
    }
  }
}
