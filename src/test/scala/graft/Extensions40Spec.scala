package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions40

/** Batch-40 invariants: the CI brackets the true mean on planted data,
  * tightens with homogeneity, and is exactly reproducible.
  */
class Extensions40Spec extends SparkSpec {

  test("x116 planted: CI brackets the true mean; constant metric gives zero-width CI") {
    import spark.implicits._
    // metric = 100 + (id % 11): true mean = 100 + 5 = 105 for full cycles
    val rows = (1L to 1100L).map(i => (i, 100L + i % 11L)).toDF("id", "v")
    val out = Extensions40.batchMeansCi(rows, "id", col("v")).head()
    val (lo, hi, m) = (out.getAs[Double]("ci_lo"), out.getAs[Double]("ci_hi"),
      out.getAs[Double]("mean"))
    assert(out.getAs[Long]("n_rows") == 1100L)
    assert(lo <= 105.0 && 105.0 <= hi, s"CI must bracket the true mean: $out")
    assert(math.abs(m - 105.0) < 1.0)
    val const = Extensions40.batchMeansCi(
      rows.withColumn("v", lit(42L)), "id", col("v")).head()
    assert(const.getAs[Double]("se") == 0.0 &&
      const.getAs[Double]("ci_lo") == 42.0 && const.getAs[Double]("ci_hi") == 42.0,
      s"constant metric has a degenerate CI: $const")
  }

  test("x116 fixture: ci_lo <= mean <= ci_hi, se >= 0, repartition-deterministic") {
    val out = SparkEntry.queries("x116_mean_ci")(spark, sf0001).head()
    assert(out.getAs[Double]("ci_lo") <= out.getAs[Double]("mean"))
    assert(out.getAs[Double]("mean") <= out.getAs[Double]("ci_hi"))
    assert(out.getAs[Double]("se") >= 0.0)
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").repartition(7)
    val again = Extensions40.batchMeansCi(docs, "doc_id",
      size(split(lower(col("text")), " ")).cast("long")).head()
    assert(out.toSeq == again.toSeq, "partitioning must not move the CI")
  }
}
