package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions32

/** Batch-32 invariants beyond the value-level oracles. */
class Extensions32Spec extends SparkSpec {

  test("x104 planted fit: a source the merges cover compresses; an unseen-alphabet source does not") {
    import spark.implicits._
    // merges learned for 'ab'-heavy text compress source P; source Q's
    // words share no adjacent pairs with the merge list
    val corpus = Seq(
      ("P", 1L, "abab abab ab abab"),
      ("P", 2L, "ab abab ab"),
      ("Q", 3L, "xq zr vt"),
      ("Q", 4L, "qx rz tv")).toDF("source", "doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val out = Extensions32.bpeFitReport(corpus, "source", "text", merges)
      .collect().map(r => r.getString(0) -> r).toMap
    val p = out("P"); val q = out("Q")
    assert(p.getAs[Double]("subwords_per_word") < 1.6,
      s"P must compress: $p")
    assert(q.getAs[Double]("subwords_per_word") == 2.0,
      s"Q is untouched 2-char words: $q")
    assert(p.getAs[Double]("single_sym_frac") > 0.5, s"P singles: $p")
    assert(q.getAs[Double]("single_sym_frac") == 0.0, s"Q singles: $q")
  }

  test("x105 calibration: precision target met, maximal recall among qualifying thresholds, degenerate targets behave") {
    import spark.implicits._
    // margins descending with labels: top 3 positive, then mixed
    val scored = Seq(
      (10L, true), (9L, true), (8L, true), (7L, false), (6L, true),
      (5L, false), (4L, false), (3L, true), (2L, false), (1L, false))
      .toDF("margin_micro", "label")
    val out = Extensions32.calibrateThreshold(
      scored, "margin_micro", "label", targetPermille = 750).head()
    // walk: t=10 p=1, t=9 p=1, t=8 p=1, t=7 p=.75, t=6 p=.8, t=5 .667 ...
    // max kept with p >= .75 is t=6 (kept 5, p 0.8)
    assert(out.getAs[Long]("threshold_micro") == 6L, s"$out")
    assert(out.getAs[Long]("n_kept") == 5L)
    assert(out.getAs[Double]("precision") == 0.8)
    assert(out.getAs[Double]("recall") == 0.8)
    // a 100% target keeps the pure-positive prefix
    val strict = Extensions32.calibrateThreshold(
      scored, "margin_micro", "label", targetPermille = 1000).head()
    assert(strict.getAs[Long]("threshold_micro") == 8L && strict.getAs[Long]("n_kept") == 3L)
  }

  test("x105 fixture: the calibrated gate clears its target on the x94 scores") {
    val out = SparkEntry.queries("x105_calibrate_gate")(spark, sf0001).head()
    assert(out.getAs[Double]("precision") >= 0.9)
    assert(out.getAs[Long]("n_kept") > 0)
    assert(out.getAs[Double]("recall") > 0)
  }
}
