package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions91

/** Batch-91 invariants: paragraph dedup keeps exactly one copy of a
  * cross-doc boilerplate paragraph (in the smallest carrying doc),
  * drops near-duplicate paragraphs pairwise keep-first, rebuilds docs
  * in paragraph order, and leaves a clean corpus untouched.
  */
class Extensions91Spec extends SparkSpec {

  private val boiler =
    "subscribe now for daily updates all rights reserved by the site owner"

  test("x210 planted: shared boilerplate paragraph survives only in the smallest doc; unique paragraphs untouched") {
    import spark.implicits._
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta\n\n$boiler"),
      (2L, s"$boiler\n\niota kappa lambda mu nu xi omicron pi"),
      (3L, s"rho sigma tau upsilon phi chi psi omega\n\n$boiler"),
      (4L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = Extensions91.dedupParagraphs(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 carries the smallest pid for the boiler -> keeps it
    assert(out(1L).getLong(2) == 0L && out(1L).getString(3).contains(boiler))
    // docs 2 and 3 lose exactly the boiler, keep their own paragraph
    assert(out(2L).getLong(1) == 2L && out(2L).getLong(2) == 1L)
    assert(out(2L).getString(3) == "iota kappa lambda mu nu xi omicron pi")
    assert(out(3L).getLong(2) == 1L &&
      out(3L).getString(3) == "rho sigma tau upsilon phi chi psi omega")
    // the clean doc is byte-identical
    assert(out(4L).getLong(2) == 0L &&
      out(4L).getString(3) == "one two three four five six seven eight")
  }

  test("x210 planted: near-duplicate paragraph (one token changed) drops in the later doc; rebuild preserves paragraph order") {
    import spark.implicits._
    // 20 tokens, only the LAST differs: 16 shingles each, 11 shared
    // -> jaccard 11/21 = 0.5238 >= 0.5 (a mid-string change would kill
    // 5 shingles per side and land at 0.23 — below the gate)
    val stem = "the quick brown fox jumps over the lazy dog while the slow red hen watches from the old wooden"
    val para = s"$stem fence"
    val near = s"$stem gate"
    val corpus = Seq(
      (10L, s"first unique lead paragraph with plenty of words here\n\n$para"),
      (20L, s"$near\n\nsecond unique tail paragraph with plenty of words here"))
      .toDF("doc_id", "text")
    val out = Extensions91.dedupParagraphs(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getLong(2) == 0L)
    // doc 20's near-dup drops; its tail paragraph survives alone
    assert(out(20L).getLong(1) == 2L && out(20L).getLong(2) == 1L,
      s"near-dup must drop: ${out(20L)}")
    assert(out(20L).getString(3) ==
      "second unique tail paragraph with plenty of words here")
    // doc 10's rebuild keeps paragraph order with the \n\n joiner
    assert(out(10L).getString(3) ==
      s"first unique lead paragraph with plenty of words here\n\n$para")
  }

  test("x210 planted: a doc that is ALL boilerplate rebuilds to empty; intra-doc exact repeat collapses") {
    import spark.implicits._
    val corpus = Seq(
      (1L, s"$boiler"),
      (2L, s"$boiler\n\n$boiler"),
      (3L, s"unique content paragraph with sufficient words inside\n\nunique content paragraph with sufficient words inside"))
      .toDF("doc_id", "text")
    val out = Extensions91.dedupParagraphs(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 0L)
    assert(out(2L).getLong(1) == 2L && out(2L).getLong(2) == 2L &&
      out(2L).getString(3) == "", s"all-boiler doc empties: ${out(2L)}")
    // intra-doc repeat: first occurrence kept, second dropped
    assert(out(3L).getLong(2) == 1L &&
      out(3L).getString(3) == "unique content paragraph with sufficient words inside")
  }

  test("x210 fixture: every third doc's footer dedups to one corpus-wide copy") {
    val out = SparkEntry.queries("x210_paragraph_dedup")(spark, sf0001)
    val rows = out.collect()
    // smallest doc_id divisible by 3 keeps the footer; every other
    // multiple of 3 drops exactly one paragraph
    val multiples = rows.filter(r => r.getLong(0) % 3 == 0)
    assert(multiples.head.getLong(2) == 0L,
      s"first footer carrier keeps it: ${multiples.head}")
    val laterDrops = multiples.tail.map(_.getLong(2))
    assert(laterDrops.forall(_ >= 1L),
      "every later footer carrier must drop the footer")
    // non-multiples have no footer to lose; any drops there are organic
    // near-dups of whole texts (the x02 pairs) — sanity: n_paras == 1
    rows.filter(r => r.getLong(0) % 3 != 0).foreach(r =>
      assert(r.getLong(1) == 1L, s"non-footer docs are one paragraph: $r"))
  }
}
