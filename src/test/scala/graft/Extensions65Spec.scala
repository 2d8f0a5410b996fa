package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions65

/** Batch-65 invariants: association rules reproduce hand-computed lift
  * and read direction asymmetrically; Flesch counts syllables and
  * sentences exactly and bands at the documented boundaries.
  */
class Extensions65Spec extends SparkSpec {

  test("x162 planted: hand-computed lift; confidence is directional") {
    import spark.implicits._
    // 10 baskets: A in 1..8; B in 1..4 and 9; A∧B in 1..4
    val rows = (1 to 8).map(b => (b.toLong, "A")) ++
      ((1 to 4) :+ 9).map(b => (b.toLong, "B")) ++
      (1 to 10).map(b => (b.toLong, "F"))       // filler in every basket
    val out = Extensions65.associationRules(rows.toDF("b", "i"), "b", "i",
      minBoth = 2L, topK = 50).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    // n_AB = 4, N = 10, n_A = 8, n_B = 5:
    // support .4, conf(A->B) = 4/8 = .5, lift = 4*10/(8*5) = 1.0
    assert(ab.getLong(2) == 4 && ab.getDouble(3) == 0.4 &&
      ab.getDouble(4) == 0.5 && ab.getDouble(5) == 1.0, s"$ab")
    val ba = out(("B", "A"))
    assert(ba.getDouble(4) == 0.8, s"conf(B->A) = 4/5: $ba")
    assert(ba.getDouble(5) == 1.0, "lift is symmetric")
  }

  test("x163 planted: exact counts and the published formula") {
    import spark.implicits._
    // "the cat sat. the dog ran!" -> 6 words, 2 sentences,
    // vowel groups: e,a,a,e,o,a = 6
    val docs = Seq((1L, "The cat sat. The dog ran!"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val out = Extensions65.fleschReadability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 6 && d1.getLong(2) == 2 && d1.getLong(3) == 6,
      s"hand counts: $d1")
    val fre = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(math.abs(d1.getDouble(4) - fre) < 1e-9, s"FRE = $fre: $d1")
    assert(d1.getString(5) == "easy", s"$fre >= 70 -> easy")
    // "nothing here": 2 words, 1 sentence (floor), vowel groups o,i,e,e = 4
    val d2 = out(2L)
    assert(d2.getLong(2) == 1 && d2.getLong(3) == 4, s"$d2")
  }

  test("x162 fixture: top-50, lift ordered, all above min support") {
    val out = SparkEntry.queries("x162_assoc_rules")(spark, sf0001).collect()
    assert(out.length <= 50 && out.nonEmpty)
    val lifts = out.map(_.getDouble(5)).toSeq
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    out.foreach(r => assert(r.getLong(2) >= 2L))
  }

  test("x163 fixture: every doc banded, scores finite") {
    val out = SparkEntry.queries("x163_flesch")(spark, sf0001).collect()
    assert(out.length == 500)
    val bands = out.map(_.getString(5)).distinct.toSet
    assert(bands.subsetOf(Set("easy", "standard", "difficult", "very_hard")))
  }
}
