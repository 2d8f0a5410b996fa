package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions111

/** Batch-111 invariants: the prefix filter is LOSSLESS (same pairs as the
  * full-index join, boundary cases included) while provably pruning the
  * candidate space; Dirichlet-QL ranks by term frequency and penalizes
  * length.
  */
class Extensions111Spec extends SparkSpec {

  /** Word-set corpus with a stopword every doc shares ("the"), one clear
    * near-dup pair (1,2), and a boundary pair (3,4) at exactly J = 2/3.
    */
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the red fox jumps over lazy dogs tonight"),
      (2L, "the red fox jumps over lazy dogs today"),
      (3L, "the alpha beta gamma delta"),   // {the,alpha,beta,gamma,delta}
      (4L, "the alpha beta gamma omega"),   // shared 4, union 6 → J = 2/3
      (5L, "the cooking pasta sauce recipe kitchen dinner"),
      (6L, "the gardening soil compost seeds spring planting")
    ).toDF("doc_id", "text")
  }

  /** Full-index exact truth: every pair sharing ≥1 token, integer filter. */
  private def bruteTruth(tNum: Long, tDen: Long) = {
    val sets = Extensions111.tokenSets(corpus, "doc_id", "text", 1)
    val tok = sets.select(col("doc_id"), explode(col("tk")).as("term"))
    tok.as("a").join(tok.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sets.select(col("doc_id").as("doc_a"), col("tk").as("tka"),
        col("sz").as("na")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("tk").as("tkb"),
        col("sz").as("nb")), Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("tka"), col("tkb"))).cast("long"))
      .filter(col("shared") * lit(tDen) >=
        lit(tNum) * (col("na") + col("nb") - col("shared")))
      .select(col("doc_a"), col("doc_b"))
  }

  test("prefix filter is lossless: pairs == full-index truth, boundary J = t included") {
    val got = Extensions111
      .prefixFilterJaccardPairs(corpus, "doc_id", "text", 2L, 3L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteTruth(2L, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got $got want $want")
    assert(got.contains((3L, 4L)), "the exactly-at-threshold pair must survive")
    assert(got.contains((1L, 2L)))
  }

  test("just-below-threshold pair excluded (integer filter, no float rounding)") {
    // (3,4) at J = 2/3: present at t = 2/3, absent at any t > 2/3
    val above = Extensions111
      .prefixFilterJaccardPairs(corpus, "doc_id", "text", 67L, 100L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!above.contains((3L, 4L)), s"J=0.6667 rounds up but 2/3 < 67/100: $above")
  }

  test("the shared stopword never generates candidates on its own") {
    // every doc shares "the" (max df ⇒ last in every prefix order); docs
    // 5 and 6 overlap ONLY there, so prefix filtering must never pair them
    val sets = Extensions111.tokenSets(corpus, "doc_id", "text", 1)
    val cand = Extensions111.prefixCandidates(sets, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cand.contains((5L, 6L)),
      s"stopword-only overlap must be pruned before the join: $cand")
    // and pruning is real: strictly fewer candidates than the full index pairs
    val full = bruteTruth(1L, 100L).collect().length // ≥1 shared token pairs
    assert(cand.size < full, s"prefix candidates ${cand.size} vs full $full")
  }

  test("dirichletQueryLikelihood: tf raises score, length penalizes, self excluded") {
    import spark.implicits._
    val c = Seq(
      (0L, "espresso machine"),                          // the query
      (1L, "espresso espresso espresso roast grinder"),  // heavy tf
      (2L, "espresso roast grinder brew filter"),        // one tf, same dl
      (3L, "espresso roast grinder brew filter water cup mug spoon towel " +
        "napkin tray sugar milk foam")                   // one tf, long dl
    ).toDF("doc_id", "text")
    val got = Extensions111
      .dirichletQueryLikelihood(c, c.filter(col("doc_id") === 0L),
        "doc_id", "text", k = 3)
      .collect()
    assert(!got.map(_.getLong(1)).contains(0L), "self-match excluded")
    val rankOf = got.map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(rankOf(1L) < rankOf(2L), s"higher tf must outrank: $rankOf")
    assert(rankOf(2L) < rankOf(3L), s"same tf, longer doc penalized: $rankOf")
  }

  test("x253/x254 fixtures: sane shapes") {
    val pp = SparkEntry.queries("x253_prefix_filter_pairs")(spark, sf0001).collect()
    assert(pp.forall(r => r.getLong(0) < r.getLong(1)), "ordered pairs")
    assert(pp.forall(_.getDouble(5) >= 0.5), "all at or above threshold")
    val ql = SparkEntry.queries("x254_dirichlet_ql")(spark, sf0001).collect()
    assert(ql.map(_.getLong(0)).distinct.length == 5 && ql.length == 15)
  }
}
