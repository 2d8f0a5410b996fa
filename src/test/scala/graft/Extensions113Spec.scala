package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions113

/** Batch-113 invariants: sequence-mining support counts match the
  * ∃-subsequence definition (gaps, repeats, strict order), the Apriori
  * prune never changes the answer; W1 is the exact transport integral —
  * it orders a near shift under a far shift of the same mass, which
  * bin-wise divergences cannot.
  */
class Extensions113Spec extends SparkSpec {

  private def log = {
    import spark.implicits._
    // u1: A B C   u2: A A B   u3: C B A   u4: B (A,B concurrent at t=9)
    Seq(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L),
      (2L, "A", 1L), (2L, "A", 2L), (2L, "B", 3L),
      (3L, "C", 1L), (3L, "B", 2L), (3L, "A", 3L),
      (4L, "B", 9L), (4L, "A", 9L)
    ).toDF("u", "t", "us").select(col("u"), col("t"),
      timestamp_micros(col("us")).as("ts"))
  }

  test("sequence supports: gaps, repeats, strict concurrent-tie rule") {
    val got = Extensions113
      .seqPatternSupport(log, "u", "t", "ts", 1L, 100L) // minSup = 1 user
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("A") == 4L && got("B") == 4L && got("C") == 2L)
    // A>B: u1 (gap none), u2, NOT u3 (B before A), NOT u4 (concurrent)
    assert(got("A>B") == 2L, s"strict-order + concurrency: $got")
    assert(got("A>A") == 1L, s"repeated type = two occurrences: $got")
    // A>C holds for u1 (gap over B allowed)
    assert(got("A>C") == 1L)
    assert(got("A>B>C") == 1L && !got.contains("B>A>C"), s"triples: $got")
    assert(got("A>A>B") == 1L, "earliest-completion DP handles repeats")
  }

  test("Apriori prune does not change the frequent answer") {
    // at 50% (2 of 4 users) C is infrequent (2 users = exactly at
    // threshold: kept); at 60% (3 users) C drops and so must every
    // pattern containing it, while A>B (2 users) drops too
    val at50 = Extensions113.seqPatternSupport(log, "u", "t", "ts", 1L, 2L)
      .collect().map(_.getString(0)).toSet
    assert(at50.contains("C") && at50.contains("A>B"))
    val at60 = Extensions113.seqPatternSupport(log, "u", "t", "ts", 3L, 5L)
      .collect().map(_.getString(0)).toSet
    assert(at60 == Set("A", "B"), s"only the singletons survive 60%: $at60")
  }

  test("W1 orders a near shift under a far shift; exact value") {
    import spark.implicits._
    // three groups of 4 values in bins {0,1}, {2,3}, {10,11} (width 1)
    val rows =
      Seq(0L, 0L, 1L, 1L).map(("g0", _)) ++
      Seq(2L, 2L, 3L, 3L).map(("g2", _)) ++
      Seq(10L, 10L, 11L, 11L).map(("gA", _))
    val df = rows.toDF("g", "v")
    val got = Extensions113.wasserstein1Matrix(df, "g", "v", 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // identical shapes shifted by k bins -> W1 = k exactly
    assert(got(("g0", "g2")) == 2.0, s"shift-2: $got")
    assert(got(("g0", "gA")) == 10.0, s"shift-10: $got")
    assert(got(("g2", "gA")) == 8.0)
    // bin-wise KL/overlap sees both as 'disjoint'; W1 orders them
    assert(got(("g0", "g2")) < got(("g0", "gA")))
  }

  test("x258/x259 fixtures: sane shapes") {
    val sp = SparkEntry.queries("x258_seq_patterns")(spark, sf0001).collect()
    assert(sp.nonEmpty && sp.forall(_.getLong(2) > 0))
    assert(sp.map(_.getLong(1)).distinct.sorted.head == 1L)
    val w1 = SparkEntry.queries("x259_wasserstein")(spark, sf0001).collect()
    assert(w1.nonEmpty && w1.forall(_.getDouble(2) >= 0.0))
    assert(w1.forall(r => r.getString(0) < r.getString(1)))
  }
}
