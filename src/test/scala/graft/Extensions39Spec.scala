package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions39

/** Batch-39 invariants: PMI surfaces the planted collocation and
  * punishes frequent-but-independent pairs; kappa is 1 on perfect
  * agreement, ~0 on independent raters, and the confusion matrix
  * partitions the rows.
  */
class Extensions39Spec extends SparkSpec {

  test("x114 planted collocation: the always-together pair out-PMIs the frequent independent pair") {
    import spark.implicits._
    // "zig zag" always adjacent (10 docs); "the" is everywhere, so
    // "the the" has high count but low PMI
    val docsDf = ((1 to 10).map(i => s"zig zag the the filler$i the") ++
      (1 to 10).map(i => s"the the other$i words$i the"))
      .toDF("text")
    val out = Extensions39.pmiBigrams(docsDf, "text", k = 5, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val byPair = out.map { case (l, r, p) => (l, r) -> p }.toMap
    assert(byPair.contains(("zig", "zag")), s"planted collocation must rank: ${out.toSeq}")
    val zig = byPair(("zig", "zag"))
    byPair.get(("the", "the")).foreach(t =>
      assert(zig > t, s"collocation must out-PMI the frequent pair: $zig vs $t"))
    assert(out.head._1 == "zig" && out.head._2 == "zag",
      s"zig-zag is the top collocation: ${out.toSeq}")
  }

  test("x115 kappa: perfect agreement is 1; independent raters land near 0; matrix partitions") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i, i % 2 == 0)).toDF("id", "keep")
    val same = Extensions39.raterAgreement(a, a, "id", "keep", "keep").head()
    assert(same.getAs[Double]("kappa") == 1.0, s"self-agreement is 1: $same")
    // rater B independent of A: keep iff i % 4 < 2 (half keep, orthogonal phase)
    val b = (1L to 100L).map(i => (i, i % 4 < 2)).toDF("id", "keep")
    val ind = Extensions39.raterAgreement(a, b, "id", "keep", "keep").head()
    assert(math.abs(ind.getAs[Double]("kappa")) < 0.1,
      s"independent raters must land near 0: $ind")
    val cells = Seq("n_both_keep", "n_both_drop", "n_only_a", "n_only_b")
      .map(ind.getAs[Long]).sum
    assert(cells == ind.getAs[Long]("n"), "confusion matrix partitions the rows")
  }

  test("x115 fixture: kappa in [-1, 1], p_observed >= p_chance iff kappa >= 0, deterministic") {
    val out = SparkEntry.queries("x115_rater_kappa")(spark, sf0001).head()
    val k = out.getAs[Double]("kappa")
    assert(k >= -1.0 && k <= 1.0)
    val po = out.getAs[Double]("p_observed"); val pe = out.getAs[Double]("p_chance")
    assert((po >= pe) == (k >= 0.0), s"sign consistency: $out")
    val again = SparkEntry.queries("x115_rater_kappa")(spark, sf0001).head()
    assert(out.toSeq == again.toSeq)
  }
}
