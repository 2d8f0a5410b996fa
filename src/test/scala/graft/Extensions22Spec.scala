package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions22

/** Batch-22 invariants beyond the value-level oracles. */
class Extensions22Spec extends SparkSpec {

  test("x83 count-min: one-sided error holds and the sketch actually estimates") {
    val rows = SparkEntry.queries("x83_countmin_hh")(spark, sf0001).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("never_undercounts")),
      "count-min can never undercount")
    assert(rows.forall(_.getAs[Boolean]("within_eps")),
      "estimates must sit within the epsilon band")
  }

  test("x83 planted skew: the sketch overcounts a rare token that collides, never the reverse") {
    import spark.implicits._
    // one dominant token + many rares: every rare bucket shares mass with
    // something, so est >= true strictly somewhere while never dipping below
    val corpus = Seq.tabulate(200)(i =>
      (i.toLong, (Seq.fill(50)("dom") ++ Seq(s"rare$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Extensions22.countMinHeavyHitters(corpus, "text",
      width = 32, depth = 2, topK = 10)
    assert(out.filter(!col("never_undercounts")).count() == 0)
  }

  test("x84 weighted sample: deterministic, k rows, weight-proportional in aggregate") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val s1 = Extensions22.weightedPrioritySample(d, "doc_id", "n_chars", 50)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val s2 = Extensions22.weightedPrioritySample(d, "doc_id", "n_chars", 50)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(s1 == s2 && s1.size == 50)
    // ES property: the sampled set's mean weight must exceed the corpus
    // mean (heavier docs are preferentially included)
    val corpusMean = d.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = d.filter(col("doc_id").isin(s1.toSeq: _*))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
  }

  test("x84 an overwhelming weight is always selected; zero weights never are") {
    import spark.implicits._
    val corpus = ((1L to 99L).map(i => (i, 1.0)) :+ (100L, 1.0e9))
      .toDF("doc_id", "w")
      .union(Seq((101L, 0.0)).toDF("doc_id", "w"))
    val sel = Extensions22.weightedPrioritySample(corpus, "doc_id", "w", 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(sel.contains(100L), "priority ln(u)/w -> 0 as w -> inf: must be picked")
    assert(!sel.contains(101L), "zero-weight rows carry no mass")
    assert(sel.size == 10)
  }
}
