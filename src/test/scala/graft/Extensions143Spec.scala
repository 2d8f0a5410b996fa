package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions143

/** Batch-143 invariants: conformal's order-statistic threshold and its
  * small-fold refusal; greedy coverage picks the planted superset doc
  * first with non-increasing gains; the burst card ranks a planted
  * rare-token run above common prose.
  */
class Extensions143Spec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("conformalCard: counts match the folds, q is a calib score, coverage sane") {
    import spark.implicits._
    val labeled = (0L until 200L).map(i =>
      (i, (1 to 60).map(j => s"w${(i * 31 + j) % 97}").mkString(" "),
        (i % 3 == 0))).toDF("doc_id", "text", "keep")
    val r = Extensions143.conformalCard(labeled, "doc_id", "text", "keep").head
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L, s"fold sizes: $r")
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L, s"q in range: $r")
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L, s"coverage: $r")
  }

  test("conformalCard: a fold too small for the level loud-refuses") {
    import spark.implicits._
    // 30 docs -> 3 calib rows; alpha=1 permille needs k=ceil(31*.999)=31 > 3
    val tiny = (0L until 30L).map(i =>
      (i, s"alpha beta gamma d$i", i % 2 == 0)).toDF("doc_id", "text", "keep")
    val e = intercept[IllegalArgumentException] {
      Extensions143.conformalCard(tiny, "doc_id", "text", "keep",
        alphaPermille = 1)
    }
    assert(e.getMessage.contains("calibration fold too small"), e.getMessage)
  }

  test("greedyCoverageSelect: planted superset wins round 1, gains non-increasing") {
    // doc 7 contains every shingle of docs 1-3 plus its own
    val d1 = "aa bb cc dd ee"
    val d2 = "ff gg hh ii jj"
    val d3 = "kk ll mm nn oo"
    val d7 = s"$d1 $d2 $d3 pp qq rr"
    val got = Extensions143.greedyCoverageSelect(
        docs(Seq((1L, d1), (2L, d2), (3L, d3), (7L, d7))), "doc_id", "text",
        k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head._2 == 7L, s"superset doc first: ${got.toSeq}")
    val gains = got.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"greedy gains are non-increasing: ${gains.toSeq}")
    // covered_cum is cumulative and ends at the union size
    val cums = got.map(_._4)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, s"${cums.toSeq}")
  }

  test("greedyCoverageSelect: stops early when everything is covered") {
    val got = Extensions143.greedyCoverageSelect(
      docs(Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"))), "doc_id", "text",
      k = 5)
    // doc 1 covers all shingles; doc 2 adds nothing but still has the
    // max (zero... no: zero-gain docs have no uncovered rows, so the
    // gains table is empty after round 1 and the loop stops)
    assert(got.count() == 1L, "one pick covers the corpus")
  }

  test("surprisalBurst: a rare-token run out-bursts common prose") {
    // 30 docs of identical common prose + one doc whose middle carries a
    // 20-token unique run
    val common = (1 to 40).map(_ => "the").mkString(" ")
    val rare = ((1 to 10).map(_ => "the") ++ (1 to 20).map(i => s"z$i") ++
      (1 to 10).map(_ => "the")).mkString(" ")
    val corpus = docs((1L to 30L).map(i => (i, common)) :+ (99L, rare))
    val bursts = Extensions143.surprisalBurst(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bursts(99L) > bursts(1L),
      s"planted run must out-burst prose: ${bursts(99L)} vs ${bursts(1L)}")
    assert(bursts.filterKeys(_ != 99L).values.toSet.size == 1,
      "identical docs read identical bursts")
  }
}
