package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions27

/** Batch-27 invariants beyond the value-level oracle: PQ must actually
  * approximate nearest-neighbor search, not just run deterministic
  * arithmetic.
  */
class Extensions27Spec extends SparkSpec {

  private def vectors = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("x95 ADC recall: PQ top-5 overlaps the exact top-5 well above chance") {
    val queries = vectors.filter(col("vec_id") < 10)
    val codebook = Extensions27.pqTrain(vectors, "vec_id", "embedding")
    val codes = Extensions27.pqEncode(vectors, "vec_id", "embedding", codebook)
    val pq = Extensions27.pqAdcTopK(codes, queries, "vec_id", "embedding", codebook)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Extensions27.bruteTopK(vectors, queries, "vec_id", "embedding")
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    // 32 x 2-dim subspaces, 16 centroids each: recall 0.58 on this
    // near-random fixture (measured; deterministic). Chance overlap of
    // top-5-of-500 is ~1% — anything structurally broken lands there
    assert(recall >= 0.5, s"ADC recall@5 $recall must be far above chance")
    assert(exact.size == 50 && pq.size == 50)
  }

  test("x95 determinism: two trainings produce the identical codebook") {
    val c1 = Extensions27.pqTrain(vectors, "vec_id", "embedding")
    val c2 = Extensions27.pqTrain(vectors, "vec_id", "embedding")
    assert(c1.flatten.flatten.toSeq == c2.flatten.flatten.toSeq)
    assert(c1.length == Extensions27.NumSub &&
      c1.head.length == Extensions27.CodebookK &&
      c1.head.head.length == Extensions27.SubDim)
  }

  test("identical vectors encode to identical codes; a vector is its own nearest by ADC when not excluded") {
    import spark.implicits._
    // two exact duplicate pairs + noise rows
    val base = (0 until 64).map(i => (i % 7 - 3) * 0.05f)
    val other = (0 until 64).map(i => (i % 5 - 2) * 0.07f)
    def jitter(s: Int) = (0 until 64).map(i => ((i * s) % 11 - 5) * 0.03f)
    val rows = Seq(
      (0L, base), (1L, base), (2L, other), (3L, other)) ++
      (4L until 20L).map(i => (i, jitter(i.toInt)))
    val df = rows.toDF("vec_id", "embedding")
    val cb = Extensions27.pqTrain(df, "vec_id", "embedding", k = 8, iters = 3)
    val codes = Extensions27.pqEncode(df, "vec_id", "embedding", cb)
    val byVec = codes.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq }
    assert(byVec(0L) == byVec(1L) && byVec(2L) == byVec(3L),
      "identical vectors must take identical codes")
    // the duplicate of an exact pair is the ADC nearest neighbor: zero
    // table distance in every subspace
    val top1 = Extensions27.pqAdcTopK(codes, df.filter(col("vec_id") < 2),
        "vec_id", "embedding", cb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(0L) == 1L && top1(1L) == 0L,
      s"exact duplicates must rank first for each other: $top1")
  }
}
