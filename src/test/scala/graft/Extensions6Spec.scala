package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions6

/** Structural/semantic invariants for the batch-6 operators (x45-x47)
  * beyond the value-level DuckDB oracle: overlap symmetry bounds, funnel
  * monotonicity, and the shuffle-shape of the training order.
  */
class Extensions6Spec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("x45 source overlap is exact on a constructed corpus") {
    import spark.implicits._
    // srcA and srcB share exactly one 5-gram shingle; srcC shares none
    val corpus = Seq(
      ("A", "one two three four five six"),     // shingles: {1..5, 2..6}
      ("B", "one two three four five zzz"),     // shingles: {1..5, 2..6'}
      ("C", "p q r s t u")
    ).toDF("source", "text")
    val rows = Extensions6.sourceOverlap(corpus, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    // |A|=|B|=2, shared=1 ⇒ jaccard = 1/3
    assert(rows == Set(("A", "B", 1L, 0.3333)),
      s"expected exactly the A-B pair with jaccard 1/3, got $rows")
  }

  test("x46 funnel survivors are monotone non-increasing and bounded by n_pass") {
    val rows = Extensions6.x46FilterFunnel(spark, sf0001)
      .orderBy(col("stage_no")).collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_survive") <= a.getAs[Long]("n_survive"),
        "conjunction can only shrink the surviving set")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_survive") <= r.getAs[Long]("n_pass"),
        "survivors of all stages are a subset of this stage's passers")
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_input"))
    }
  }

  test("x46 funnel is a single scan with no mid-plan exchange before the scalar agg") {
    val plan = Extensions6.x46FilterFunnel(spark, sf0001)
      .queryExecution.executedPlan.toString
    // one scalar aggregate over a map stage: exactly one pair of
    // partial/final HashAggregate separated by a single-partition exchange
    assert(plan.split("FileScan parquet").length - 1 <= 1,
      s"funnel must scan the corpus once:\n$plan")
  }

  test("x47 training order is a permutation within each shard, deterministic across runs") {
    val a = Extensions6.x47TrainingOrder(spark, sf0001).collect()
    val b = Extensions6.x47TrainingOrder(spark, sf0001).collect()
    assert(a.sameElements(b), "order must be bit-identical across runs")
    val df = Extensions6.x47TrainingOrder(spark, sf0001)
    // within a shard, ord is 1..n with no gaps or dups
    val badShards = df.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("ord")).as("mx"),
        countDistinct(col("ord")).as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
      .count()
    assert(badShards == 0, "ord must be a dense 1..n permutation per shard")
    // the order must not be the identity (the salt actually shuffles):
    // doc_ids sorted by (shard, ord) differ from sorted doc_ids
    val byOrd = df.orderBy(col("shard"), col("ord"))
      .select("doc_id").collect().map(_.getLong(0))
    assert(!byOrd.sameElements(byOrd.sorted),
      "training order must differ from insertion order")
  }
}
