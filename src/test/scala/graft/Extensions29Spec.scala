package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions29

/** Batch-29 invariants beyond the value-level oracles: MMR must trade
  * relevance for coverage (not just rank by distance), and triangle
  * counts must respect graph structure.
  */
class Extensions29Spec extends SparkSpec {

  test("x98 planted clusters: pure top-k drowns in near-dups, MMR covers both clusters") {
    import spark.implicits._
    // query at the origin; cluster A: 6 near-identical vectors very
    // close to the query; cluster B: 6 near-identical vectors a bit
    // farther along a different axis. Pure top-4 by distance = all A.
    def vec(axis: Int, mag: Float, jit: Float) =
      (0 until 64).map(i =>
        (if (i == axis) mag else 0.0f) + (if (i == 63) jit else 0.0f))
    val rows = Seq((0L, (0 until 64).map(_ => 0.0f))) ++
      (1L to 6L).map(i => (i, vec(0, 0.10f, i * 0.001f))) ++
      (11L to 16L).map(i => (i, vec(1, 0.14f, (i - 10) * 0.001f)))
    val df = rows.toDF("vec_id", "embedding")
    val sel = Extensions29.mmrSelect(df, "vec_id", "embedding", queryId = 0L, k = 4)
      .collect().map(_.getAs[Long]("c_id"))
    assert(sel.length == 4 && sel.toSet.size == 4)
    assert(sel.exists(_ >= 11L),
      s"MMR must reach cluster B within 4 picks (pure top-4 would not): ${sel.toSeq}")
    assert(sel.exists(_ <= 6L), s"cluster A must still be represented: ${sel.toSeq}")
    // the first pick is pure relevance: the closest candidate overall
    val nearest = Extensions29.mmrSelect(df, "vec_id", "embedding", 0L, k = 1)
      .collect()(0).getAs[Long]("c_id")
    assert(sel(0) == nearest && nearest <= 6L)
  }

  test("x98 determinism across runs and repartitioning") {
    val d = "/root/testdata/sf0.001"
    val v = spark.read.parquet(s"$d/embeddings.parquet")
    val s1 = Extensions29.mmrSelect(v, "vec_id", "embedding", 0L)
      .collect().map(_.toSeq).toSeq
    val s2 = Extensions29.mmrSelect(v.repartition(7), "vec_id", "embedding", 0L)
      .collect().map(_.toSeq).toSeq
    assert(s1 == s2)
  }

  test("x99 planted graphs: K4 gives 3 triangles per node; pendants and chains give zero") {
    import spark.implicits._
    // K4 on 1..4, a pendant 5-1, and a disjoint path 6-7-8
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (6L, 7L), (7L, 8L)).toDF("a", "b")
    val out = Extensions29.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 4L).foreach(n => assert(out(n) == 3L, s"K4 node $n: ${out(n)}"))
    Seq(5L, 6L, 7L, 8L).foreach(n => assert(out(n) == 0L, s"node $n: ${out(n)}"))
    assert(out.values.sum == 12L, "4 triangles x 3 corners")
  }

  test("x99 edge normalization: reversed and duplicate edges do not inflate counts") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val noisy = base.union(Seq((2L, 1L), (3L, 2L), (1L, 3L), (1L, 2L)).toDF("a", "b"))
    val c1 = Extensions29.triangleCounts(base, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = Extensions29.triangleCounts(noisy, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == c2 && c1.values.forall(_ == 1L))
  }
}
