package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions58

/** Batch-58 invariants: Good–Turing reproduces a hand-computed
  * count-of-counts table (including the honest NULLs on empty next
  * classes); CMH undoes a planted Simpson's paradox that flips the
  * marginal table.
  */
class Extensions58Spec extends SparkSpec {

  test("x148 planted: hand-computed count-of-counts, r*, and unseen mass") {
    import spark.implicits._
    // 3 singletons, 2 doubletons, 1 tripleton: N = 10, p0 = 3/10
    // r*(1) = 2*N2/N1 = 4/3 = 1.3333 ; r*(2) = 3*N3/N2 = 1.5 ; r*(3) NULL
    val text = "s1 s2 s3 d1 d1 d2 d2 t1 t1 t1"
    val out = graft.ops.Extensions58.goodTuring(
      Seq((1L, text)).toDF("doc_id", "text"), "text").collect()
    assert(out.length == 3)
    val byR = out.map(r => r.getLong(0) -> r).toMap
    assert(byR(1L).getLong(1) == 3 && byR(2L).getLong(1) == 2 &&
      byR(3L).getLong(1) == 1)
    assert(byR(1L).getDouble(2) == 1.3333 && byR(2L).getDouble(2) == 1.5)
    assert(byR(3L).isNullAt(2), "no N_4 class -> r* undefined")
    assert(out.forall(_.getDouble(3) == 0.3), "p_unseen = N1/N = 0.3")
  }

  test("x148 planted: sparse count classes leave gaps NULL") {
    import spark.implicits._
    // counts 1 and 5: no class r+1 anywhere -> every r_star NULL
    val text = "a b c " + "z z z z z"
    val out = graft.ops.Extensions58.goodTuring(
      Seq((1L, text.trim)).toDF("doc_id", "text"), "text").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(2)), s"gap classes: ${out.toSeq}")
  }

  test("x149 planted: MH sees through the Simpson flip the marginal table takes") {
    import spark.implicits._
    // Two strata; within EACH, exposure doubles the outcome odds
    // (OR_stratum = 2), but exposure concentrates in the low-rate
    // stratum, dragging the marginal OR below 1.
    def block(stratum: String, exposed: Boolean, outcome: Boolean, n: Int) =
      Seq.fill(n)((stratum, exposed, outcome))
    val subjects = (
      // stratum "hi": base odds 1:1 unexposed; exposed odds 2:1; few exposed
      block("hi", false, true, 200) ++ block("hi", false, false, 200) ++
      block("hi", true, true, 40) ++ block("hi", true, false, 20) ++
      // stratum "lo": base odds 1:4 unexposed; exposed odds 1:2; many exposed
      block("lo", false, true, 40) ++ block("lo", false, false, 160) ++
      block("lo", true, true, 200) ++ block("lo", true, false, 400)
    ).toDF("stratum", "exposed", "outcome")
    val out = Extensions58.cmhOddsRatio(subjects, "stratum", "exposed", "outcome")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("hi").getDouble(5) == 2.0 && out("lo").getDouble(5) == 2.0,
      s"within-stratum OR = 2: $out")
    val orMh = out("hi").getDouble(6)
    assert(orMh == out("lo").getDouble(6), "pooled value repeats on every row")
    assert(orMh > 1.5 && orMh < 2.5, s"MH recovers the true effect ~2: $orMh")
    // the marginal (collapsed) table flips below 1 — confirm the trap exists
    val a = 240.0; val b = 420.0; val c = 240.0; val d = 360.0
    assert(a * d / (b * c) < 1.0, "planted marginal OR < 1 (Simpson)")
  }

  test("x149 fixture: consistent pooled value, cells partition the users") {
    // 15 users over ~5 week strata: the A/A OR is small-sample noise,
    // so assert structure, not magnitude (sf0.01 oracle is the value gate)
    val out = SparkEntry.queries("x149_cmh")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val orMh = out.head.getDouble(6)
    assert(out.forall(_.getDouble(6) == orMh), "pooled value repeats")
    assert(orMh >= 0.0)
    val total = out.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)
      + r.getLong(4)).sum
    assert(total == 15L, s"cells partition the 15 fixture users: $total")
  }
}
