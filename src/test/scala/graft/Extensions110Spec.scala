package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions4, Extensions110}

/** Batch-110 invariants: expansion terms come from the feedback docs
  * and never echo the query; re-querying with them recovers a
  * synonym-hidden relevant doc; the snippet window contains the most
  * query terms any window of its width can.
  */
class Extensions110Spec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // query doc: talks about "car engine repair"
      (0L, "car engine repair manual for the home mechanic garage"),
      // feedback-reachable: shares surface terms AND introduces synonyms
      (1L, "car engine repair guide automobile motor fix overhaul steps"),
      (2L, "engine repair tips automobile motor maintenance schedule notes"),
      // the synonym-only doc: relevant, shares NO surface term with q
      (3L, "automobile motor overhaul maintenance fix workshop handbook"),
      // distractors
      (4L, "cooking pasta sauce recipe kitchen dinner tonight quick easy"),
      (5L, "gardening soil compost seeds spring planting guide weekend")
    ).toDF("doc_id", "text")
  }

  test("queryExpansionTerms: mined from feedback docs, query terms excluded, deterministic") {
    import spark.implicits._
    val q = corpus.filter(col("doc_id") === 0L)
    val got = Extensions110.queryExpansionTerms(corpus, q, "doc_id", "text",
      kFeedback = 2, m = 4)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    val qTerms = "car engine repair manual for the home mechanic garage".split(" ").toSet
    assert(got.nonEmpty && got.forall(t => !qTerms.contains(t._1)),
      s"expansion must not echo the query: ${got.mkString(",")}")
    val terms = got.map(_._1).toSet
    assert(terms.exists(Set("automobile", "motor").contains),
      s"the feedback docs' synonyms must surface: $terms")
    val again = Extensions110.queryExpansionTerms(corpus, q, "doc_id", "text",
      kFeedback = 2, m = 4).collect().map(r => (r.getString(1), r.getLong(3)))
    assert(got.toSeq == again.toSeq, "deterministic")
  }

  test("expansion recovers the synonym-only doc the raw query misses") {
    import spark.implicits._
    val q = corpus.filter(col("doc_id") === 0L)
    val raw = Extensions4.bm25TopK(corpus, q, "doc_id", "text", k = 5)
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(!raw.contains(3L), "doc 3 shares no surface term with the query")
    val exp = Extensions110.queryExpansionTerms(corpus, q, "doc_id", "text",
      kFeedback = 2, m = 4).select("term").collect().map(_.getString(0))
    val expanded = q.select(col("doc_id"),
      concat(col("text"), lit(" " + exp.mkString(" "))).as("text"))
    val re = Extensions4.bm25TopK(corpus, expanded, "doc_id", "text", k = 5)
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(re.contains(3L),
      s"the expanded query must reach the synonym-only doc: $re via ${exp.toSeq}")
  }

  test("snippets: the chosen window beats every other window of the same width") {
    import spark.implicits._
    val c = Seq(
      (10L, ("x " * 30).trim + " alpha beta gamma " + ("y " * 30).trim)
    ).toDF("doc_id", "text")
    val q = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val hits = Seq((0L, 10L)).toDF("q_id", "c_id")
    val got = Extensions110.snippets(c, hits, q, "doc_id", "text", w = 5).head
    assert(got.getLong(3) == 3L, s"all three query terms fit one window: $got")
    val snip = got.getString(4)
    assert(snip.contains("alpha") && snip.contains("beta") && snip.contains("gamma"),
      s"snippet must contain the dense window: $snip")
  }

  test("x251/x252 fixtures: sane shapes") {
    val ex = SparkEntry.queries("x251_query_expansion")(spark, sf0001).collect()
    assert(ex.map(_.getLong(0)).distinct.length == 5 &&
      ex.forall(_.getLong(3) <= 5L),
      "every query expands; at most 5 terms each (short feedback docs may yield fewer)")
    assert(ex.forall(_.getLong(2) > 0L))
    val sn = SparkEntry.queries("x252_snippets")(spark, sf0001).collect()
    assert(sn.length == 5 && sn.forall(_.getLong(3) >= 1L))
    assert(sn.forall(r => r.getString(4).split(" ").length <= 10))
  }
}
