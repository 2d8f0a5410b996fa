package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions27, Extensions31}

/** Batch-31 invariants beyond the value-level oracles. */
class Extensions31Spec extends SparkSpec {

  private def vectors = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("x102 IVF-PQ returns only probed-cell members and overlaps full-scan ADC") {
    val cb = Extensions27.pqTrain(vectors, "vec_id", "embedding")
    val queries = vectors.filter(col("vec_id") < 10)
    val ivfpq = Extensions31.ivfPqTopK(vectors, "vec_id", "embedding", queries, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.groupBy(_._1).forall(_._2.size == 5))
    // the composed path can only LOSE candidates vs the full ADC scan
    // (same codes, same tables, restricted cells) — overlap well above
    // chance proves the routing points at the right cells
    val full = Extensions27.pqAdcTopK(
        Extensions27.pqEncode(vectors, "vec_id", "embedding", cb),
        queries, "vec_id", "embedding", cb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (ivfpq & full).size.toDouble / full.size
    assert(overlap >= 0.25, s"IVF-PQ@2/8 cells must overlap full ADC well above chance: $overlap")
  }

  test("x102 determinism under repartitioning") {
    val cb = Extensions27.pqTrain(vectors, "vec_id", "embedding")
    val q = vectors.filter(col("vec_id") < 5)
    val a = Extensions31.ivfPqTopK(vectors, "vec_id", "embedding", q, cb)
      .collect().map(_.toSeq).toSet
    val b = Extensions31.ivfPqTopK(vectors.repartition(11), "vec_id", "embedding", q, cb)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("x103 planted vocabularies: estimates track truth; underfull sketches are exact") {
    import spark.implicits._
    // A: tokens 0..999; B: 500..1499 (true overlap 500); C: 3 tokens
    val rows =
      (0 until 1000).map(i => ("A", s"tok$i")) ++
      (500 until 1500).map(i => ("B", s"tok$i")) ++
      Seq(("C", "tok1"), ("C", "tok2"), ("C", "zz"))
    val df = rows.toDF("g", "value")
    val out = Extensions31.thetaOverlap(Extensions31.thetaSketches(df, "g", "value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    // k=16 KMV: crude but unbiased-ish; just require the right order of
    // magnitude (deterministic values, pinned loosely)
    assert(ab.getAs[Double]("est_distinct_a") > 300 &&
      ab.getAs[Double]("est_distinct_a") < 3000, s"est_a: $ab")
    assert(ab.getAs[Double]("est_intersection") >= 0, s"inter: $ab")
    // C is underfull -> exact
    assert(out(("A", "C")).getAs[Double]("est_distinct_b") == 3.0)
    // and C shares nothing hashed below the joint threshold vs... well,
    // tok1/tok2 ARE in A's vocabulary; the estimate must be finite and
    // deterministic
    val again = Extensions31.thetaOverlap(Extensions31.thetaSketches(
      df.repartition(7), "g", "value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(out.view.mapValues(_.toSeq).toMap == again)
  }

  test("x103 sketch mergeability: the sketch of a union = k smallest of the sketch union") {
    import spark.implicits._
    val a = (0 until 200).map(i => ("S", s"a$i")).toDF("g", "value")
    val b = (0 until 200).map(i => ("S", s"b$i")).toDF("g", "value")
    val whole = Extensions31.thetaSketches(a.union(b), "g", "value")
      .select("v").collect().map(_.getLong(0)).toSet
    val merged = (Extensions31.thetaSketches(a, "g", "value")
      .select("v").collect().map(_.getLong(0)) ++
      Extensions31.thetaSketches(b, "g", "value")
        .select("v").collect().map(_.getLong(0)))
      .distinct.sorted.take(Extensions31.ThetaK).toSet
    assert(whole == merged, "theta sketches must merge by keeping the k smallest")
  }
}
