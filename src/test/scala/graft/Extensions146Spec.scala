package graft

import graft.ops.Extensions146

/** Batch-146 invariants: the bag form scores multiplicity (set-Jaccard
  * cannot), identical docs read 1.0, and the df cap's lossy trade is
  * visible exactly where documented.
  */
class Extensions146Spec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("weightedJaccardPairs: multiplicity bites where set-Jaccard saturates") {
    // A and B share vocabulary {a,b,c,·} (set-Jaccard 3/5 = 0.6) but
    // only 3 of 6 mass units each: bag form reads 3/9 = 0.3333
    val df = docs(Seq(
      (1L, "a b c x x x"), (2L, "a b c y y y"), (3L, "a b c x x x")))
    val got = Extensions146.weightedJaccardPairs(df, "doc_id", "text",
        threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 3L)) == 1.0, s"identical docs read 1.0: $got")
    assert(got((1L, 2L)) == 0.3333 && got((2L, 3L)) == 0.3333,
      s"bag form reads shared MASS, not shared vocabulary: $got")
  }

  test("weightedJaccardPairs: a hot shingle never seeds — the documented lossy trade") {
    // four identical docs: every trigram has df = 4 > dfCap = 2, so no
    // candidate is seeded even though all pairs are exact dups — the
    // x232-class trade, visible and bounded rather than quadratic
    val df = docs((1L to 4L).map(i => (i, "a b c d e f")))
    val got = Extensions146.weightedJaccardPairs(df, "doc_id", "text",
      threshold = 0.3, dfCap = 2)
    assert(got.count() == 0L, "df-capped seeding refuses hot shingles")
    val loose = Extensions146.weightedJaccardPairs(df, "doc_id", "text",
      threshold = 0.3, dfCap = 4)
    assert(loose.count() == 6L, "raising the cap recovers all 6 dup pairs")
  }
}
