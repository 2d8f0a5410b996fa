package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions47

/** Batch-47 invariants: the matrix-free power iteration recovers a
  * planted dominant direction, emits a unit vector, is repartition-
  * deterministic, and its Rayleigh quotient doesn't decay with rounds.
  */
class Extensions47Spec extends SparkSpec {

  test("x127 planted: a dominant axis is recovered with most of the variance") {
    import spark.implicits._
    val rows = Seq.fill(20)(Seq(2.0f, 0.0f, 0.0f, 0.0f)) ++
      Seq.fill(3)(Seq(0.0f, 1.0f, 0.0f, 0.0f)) ++
      Seq.fill(2)(Seq(0.0f, 0.0f, 0.5f, 0.0f))
    val df = rows.toDF("vec")
    val out = Extensions47.pcaPowerIteration(df, "vec", dim = 4).collect()
    assert(out.length == 4)
    val w = out.map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(math.abs(w(1L)) > 999000L, s"axis 1 dominates: $w")
    assert(math.abs(w(2L)) < 50000L && math.abs(w(3L)) < 50000L)
    val share = out.head.getDouble(3)
    assert(share > 0.9, s"planted axis carries the mass: $share")
  }

  test("x127 planted: output is a unit vector and lambda matches the axis power") {
    import spark.implicits._
    val df = Seq.fill(10)(Seq(3.0f, 0.0f)).toDF("vec")
    val out = Extensions47.pcaPowerIteration(df, "vec", dim = 2).collect()
    val norm2 = out.map(r => math.pow(r.getLong(1) / 1e6, 2)).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"unit norm: $norm2")
    // all mass on one axis: lambda = mean squared projection = 9.0
    assert(math.abs(out.head.getDouble(2) - 9.0) < 0.01)
    assert(out.head.getDouble(3) == 1.0, "single axis carries ALL variance")
  }

  test("x127 determinism under repartitioning") {
    val v = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Extensions47.pcaPowerIteration(df, "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(v) == run(v.repartition(13)))
  }

  test("x127 fixture: full card shape; Rayleigh non-decreasing with rounds") {
    val out = SparkEntry.queries("x127_pca_power")(spark, sf0001).collect()
    assert(out.length == 64)
    assert(out.map(_.getLong(0)).toSeq == (1L to 64L).toSeq)
    val lam = out.head.getDouble(2); val share = out.head.getDouble(3)
    assert(lam > 0.0 && share > 0.0 && share <= 1.0)
    assert(out.map(_.getDouble(2)).distinct.length == 1)
    val v = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val lam1 = Extensions47.pcaPowerIteration(v, "embedding", iters = 1)
      .collect().head.getDouble(2)
    assert(lam >= lam1 - 1e-3,
      s"power iteration cannot lose Rayleigh mass: r1=$lam1 r6=$lam")
  }
}
