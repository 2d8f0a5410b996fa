package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions128

/** x280–x282: generation-eval metrics against hand-computed truth on a
  * planted strip fixture, link-prediction scores on a planted bipartite
  * graph, and the phonetic key on classic Soundex examples (pinning the
  * DOCUMENTED simplified semantics).
  */
class Extensions128Spec extends SparkSpec {

  test("stripFidelityCard: hand-computed BLEU/ROUGE on a planted two-doc strip") {
    import spark.implicits._
    // shared 5-token boilerplate strips whole; fillers are per-doc unique
    val corpus = Seq(
      (1L, "u1 u2 u3 u4 b1 b2 b3 b4 b5 u5 u6 u7"),
      (2L, "v1 v2 v3 v4 b1 b2 b3 b4 b5 v5 v6 v7")).toDF("doc_id", "text")
    val r = Extensions128.stripFidelityCard(corpus, "doc_id", "text")
      .filter(col("doc_id") === 1L).collect().head
    // cleaned doc 1 = "u1..u4 u5..u7": c1=7, r1=12, m1=7 (cand tokens are
    // a subset of ref), m2=5 (the stitch bigram "u4 u5" never existed)
    assert(r.getAs[Long]("c1") == 7L && r.getAs[Long]("r1") == 12L)
    assert(r.getAs[Long]("m1") == 7L && r.getAs[Long]("m2") == 5L)
    assert(r.getAs[Long]("p1_micro") == 1000000L)
    assert(r.getAs[Long]("p2_micro") == 833333L)
    assert(r.getAs[Long]("log_bp_micro") == -714286L)
    // 2*(-714286) + round(1e6*ln(1)) + round(1e6*ln(5/6)) = -1610894
    assert(r.getAs[Long]("log_bleu2_x2_micro") == -1610894L)
    assert(r.getAs[Long]("rouge1_recall_micro") == 583333L)
    assert(r.getAs[Long]("rouge2_recall_micro") == 454545L)
  }

  test("linkPredictionScores: planted wedge graph yields exact CN/RA/AA/PA") {
    import spark.implicits._
    val edges = Seq(
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 3L)).toDF("cust", "supp")
    val rows = Extensions128.linkPredictionScores(edges, "cust", "supp",
      minCommon = 2L).collect()
    assert(rows.length == 1, s"only (1,2) shares >= 2 customers: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("sa") == 1L && r.getAs[Long]("sb") == 2L)
    assert(r.getAs[Long]("common") == 2L)
    // two customers of degree 2: RA = 2 * halfup(1e6/2) = 1000000
    assert(r.getAs[Long]("ra_micro") == 1000000L)
    // AA = 2 * (1e12 div round(1e6*ln 2)) = 2 * (1e12 div 693147) = 2885390
    assert(r.getAs[Long]("aa_micro") == 2885390L)
    // deg(s1)=3 (c101,c102,c103), deg(s2)=2
    assert(r.getAs[Long]("pa") == 6L)
  }

  test("phoneticKey pins the documented simplified-Soundex semantics") {
    import spark.implicits._
    val got = Seq("robert", "rupert", "lee", "tymczak")
      .toDF("w")
      .select(col("w"), Extensions128.phoneticKey(col("w")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("robert") == "r163" && got("rupert") == "r163",
      s"classic Soundex agreement on the textbook pair: $got")
    assert(got("lee") == "l000", s"all-vowel tails pad to zeros: $got")
    assert(got("tymczak") == "t522",
      s"adjacent same-class consonants collapse: $got")
    // the blocking card: sound-alikes share a bucket and the pair volume
    // is n*(n-1)/2
    val byKey = Extensions128.phoneticBlockingCard(
      Seq("Robert x", "Rupert y", "Rubert z", "Lee q").toDF("nm"), "nm")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKey("r163") == ((3L, 3L)), s"three sound-alikes, three pairs: $byKey")
    assert(byKey("l000") == ((1L, 0L)))
  }
}
