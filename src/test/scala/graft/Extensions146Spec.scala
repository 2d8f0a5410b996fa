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

  test("chunkText: hand-computed windows, overlap preserved, stable ids") {
    // 10 tokens, chunk 4, overlap 2 -> stride 2, starts 0,2,4,6 — a 5th
    // chunk at start 8 would be tokens 9–10, a strict subset of chunk 3
    // (tokens 7–10): the round-14 trimmed-tail rule never emits it
    val df = docs(Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))))
    val got = Extensions146.chunkText(df, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.length == 4, s"${got.toSeq}")
    assert(got(0) == ((0L, 0L, 4L, "t1 t2 t3 t4")), s"${got.toSeq}")
    assert(got(1) == ((1L, 2L, 4L, "t3 t4 t5 t6")), s"${got.toSeq}")
    assert(got(3) == ((3L, 6L, 4L, "t7 t8 t9 t10")), s"${got.toSeq}")
    // every adjacent pair overlaps by exactly 2 tokens
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 - a._2 == 2L, s"stride 2: ${got.toSeq}")
    }
  }

  test("chunkText: every token is covered and no chunk is a subset of its predecessor") {
    // lengths straddling the docLen mod stride in [1, overlap] band that
    // used to emit a fully-redundant trailing chunk (ADVICE round-14)
    for (len <- Seq(3, 4, 5, 6, 7, 9, 10, 11, 12, 13)) {
      val df = docs(Seq((1L, (1 to len).map(i => s"t$i").mkString(" "))))
      val got = Extensions146.chunkText(df, "doc_id", "text",
          chunkTokens = 4, overlapTokens = 2)
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      // coverage: last chunk reaches the final token
      assert(got.last._1 + got.last._2 == len.toLong, s"len=$len ${got.toSeq}")
      // non-redundancy: each chunk ends strictly after its predecessor
      got.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._1 + b._2 > a._1 + a._2, s"len=$len ${got.toSeq}")
        case _ => ()
      }
    }
  }

  test("chunkText: a doc shorter than one chunk yields exactly one chunk") {
    val df = docs(Seq((1L, "a b c")))
    val got = Extensions146.chunkText(df, "doc_id", "text").collect()
    assert(got.length == 1 && got(0).getLong(3) == 3L &&
      got(0).getString(4) == "a b c", s"${got.toSeq}")
  }
}
