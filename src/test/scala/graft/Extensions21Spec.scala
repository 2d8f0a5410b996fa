package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions21

/** Positional phrase search invariants beyond the value-level oracle. */
class Extensions21Spec extends SparkSpec {

  test("x82 phrase search: planted phrases, overlaps, and repeated-token phrases") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick brown elsewhere and quick brown fox at the end"),
      (3L, "no occurrence here at all"),
      (4L, "a a a a"), // overlapping matches of "a a"
      (5L, "start a b a middle a b a end") // repeated-token phrase "a b a"
    ).toDF("doc_id", "text")
    def run(phrase: String) = Extensions21.phraseSearch(corpus, "doc_id", "text", phrase)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    val qbf = run("quick brown fox")
    assert(qbf == Map(1L -> (1L, 2L), 2L -> (1L, 5L)), s"got $qbf")
    // overlapping occurrences each count: "a a" in "a a a a" -> 3
    assert(run("a a") == Map(4L -> (3L, 1L)), "overlap count")
    // a phrase with REPEATED tokens must not false-positive on partial runs
    val aba = run("a b a")
    assert(aba == Map(5L -> (2L, 2L)), s"repeated-token phrase: got $aba")
    // single-token phrase degenerates to occurrence count
    val the = run("the")
    assert(the(1L) == (2L, 1L), s"got ${the.get(1L)}")
    // case-insensitive
    assert(run("QUICK BROWN FOX").contains(1L))
  }

  test("x82 rejects empty phrases") {
    import spark.implicits._
    val corpus = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Extensions21.phraseSearch(corpus, "doc_id", "text", " ")
    }
  }
}
