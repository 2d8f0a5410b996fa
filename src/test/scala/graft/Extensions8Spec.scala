package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions8

/** Semantic invariants for the batch-8 operators (x51-x53) beyond the
  * value-level DuckDB oracle: BPE count exactness on a constructed
  * corpus, decile balance and monotonicity, stitch correctness.
  */
class Extensions8Spec extends SparkSpec {

  test("x51 BPE pair counts are exact on a constructed corpus and the plan has no global sort") {
    import spark.implicits._
    // "abab" -> ab, ba, ab ; "ab" -> ab  ⇒ ab:3, ba:1
    val corpus = Seq((1L, "abab ab")).toDF("doc_id", "text")
    val m = Extensions8.bpePairStats(corpus, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(m == Map("ab" -> 3L, "ba" -> 1L), s"got $m")
    // top-k must be TakeOrderedAndProject, not a full Sort + Limit
    val plan = Extensions8.x51BpePairStats(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k over pair counts must not globally sort:\n$plan")
  }

  test("x52 deciles are monotone in the value and roughly balanced") {
    val df = Extensions8.x52CurriculumDeciles(spark, sf0001)
    // monotone: sorting by value never decreases the decile
    val rows = df.orderBy(col("n_chars"), col("doc_id")).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("decile") <= b.getAs[Long]("decile"),
        "decile must be monotone in the curriculum value")
    }
    assert(rows.map(_.getAs[Long]("decile")).distinct.length == 10,
      "500 docs over interpolated deciles must hit all 10 buckets")
    // no bucket may hold more than 2x its fair share (ties can unbalance,
    // but n_chars at sf0.001 is near-unique)
    val n = rows.length
    val counts = rows.groupBy(_.getAs[Long]("decile")).map(_._2.length)
    assert(counts.max <= n / 5,
      s"deciles badly unbalanced: ${counts.toSeq.sorted}")
  }

  test("x53 stitch join finds exactly the planted suffix-prefix overlap") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "delta epsilon zeta eta theta iota"),   // head = doc 1's tail
      (3L, "unrelated words only here now yes")
    ).toDF("doc_id", "text")
    val got = Extensions8.stitchCandidates(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 2L, "delta epsilon zeta")), s"got ${got.toSeq}")
  }
}
