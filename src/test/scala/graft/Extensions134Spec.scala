package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions134

/** Batch-134 invariants: maj@k matches hand-computed hypergeometric
  * tails and sits below pass@k; best-of-k matches a hand-computed
  * order-statistic expectation and is monotone in k; the cartography
  * card partitions the corpus and flags a planted label-noise doc as
  * NOT easy-to-learn.
  */
class Extensions134Spec extends SparkSpec {

  test("majAtK: hand-computed hypergeometric tails") {
    import spark.implicits._
    // task a: c=2 of n=4. maj@1 = 1/2; maj@3 = [C(2,2)C(2,1)+C(2,3)]/C(4,3)
    //         = (2 + 0)/4 = 1/2.
    // task b: c=4 of n=4 -> 1 everywhere; n<5 so both excluded at k=5.
    val samples = Seq(
      ("a", 1L), ("a", 1L), ("a", 0L), ("a", 0L),
      ("b", 1L), ("b", 1L), ("b", 1L), ("b", 1L)
    ).toDF("task", "p")
    val got = Extensions134.majAtK(samples, "task", "p", ks = Seq(1, 3, 5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 750000L)), s"mean(1/2, 1): $got")
    assert(got(3L) == ((2L, 750000L)), s"mean(1/2, 1): $got")
    assert(!got.contains(5L), s"no task has 5 samples: $got")
  }

  test("x301 vs x298 on the shared fixture: voting never beats any-solve") {
    val maj = SparkEntry.queries("x301_maj_at_k")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pass = SparkEntry.queries("x298_pass_at_k")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(maj(1L) == pass(1L), "k=1: one draw, voting == any-solve")
    // maj@5 needs 3 of 5 to pass; pass@5 isn't computed, but pass@4
    // (any of 4) already dominates a 3-of-5 vote on every (n, c)
    assert(maj(5L) <= pass(4L), s"vote(5) <= any(4): $maj vs $pass")
  }

  test("bestOfKReward: hand-computed order-statistic expectation, monotone in k") {
    import spark.implicits._
    // one task, rewards 100, 200, 300, 400 (micro):
    // k=1 -> mean = 250; k=2 -> E[max] = (100*0 + 200*1 + 300*2 + 400*3)/C(4,2)
    //      = 2000/6 -> 333.33 -> 333; k=4 -> max = 400
    val samples = Seq(("t", 100L), ("t", 200L), ("t", 300L), ("t", 400L))
      .toDF("task", "r")
    val got = Extensions134.bestOfKReward(samples, "task", "r", ks = Seq(1, 2, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 250L, 2L -> 333L, 4L -> 400L), s"$got")
  }

  test("x302 fixture: best-of-k is monotone in k") {
    val bo = SparkEntry.queries("x302_best_of_k")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bo(1L) <= bo(2L) && bo(2L) <= bo(4L) && bo(4L) <= bo(8L), s"$bo")
  }

  test("trainingDynamicsCard: partitions the corpus; planted noise is not easy") {
    import spark.implicits._
    // 60 cleanly separable docs + one with the majority token but a
    // flipped label: the flipped doc cannot be high-confidence-correct.
    val labeled = (
      Seq.tabulate(30)(i => (i.toLong, "good good good", 1L)) ++
      Seq.tabulate(30)(i => (100L + i, "bad bad bad", 0L)) :+
      ((999L, "good good good", 0L))
    ).toDF("id", "text", "label")
    val card = Extensions134.trainingDynamicsCard(labeled, "id", "text", "label")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card.values.sum == 61L, s"regions partition the corpus: $card")
    assert(card.getOrElse("easy_to_learn", 0L) <= 60L,
      s"the flipped doc must not land in easy_to_learn: $card")
  }
}
