package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions84

/** Batch-84 invariants: the one-pager's KPIs agree with the component
  * operators they summarize.
  */
class Extensions84Spec extends SparkSpec {

  test("x200 planted: hand-computable corpus KPIs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), // exact dup pair
      (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val out = Extensions84.corpusOnePager(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("n_docs") == 3.0 && out("n_tokens") == 8.0)
    assert(out("exact_dup_rate") == 0.3333, s"1 of 3 is a copy: $out")
    assert(out("mean_doc_tokens") == 2.6667)
    // tokens: alpha x3, beta x2, gamma x2, delta x1 -> vocab 4, n1 1
    assert(out("type_token_ratio") == 0.5 && out("unseen_mass") == 0.125,
      s"$out")
  }

  test("x200 fixture: KPIs agree with the component operators") {
    val out = SparkEntry.queries("x200_corpus_one_pager")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("n_docs") == 500.0)
    // unseen mass must match x148's p_unseen
    val gt = SparkEntry.queries("x148_good_turing")(spark, sf0001)
      .collect().head.getDouble(3)
    assert(out("unseen_mass") == gt, s"x200 vs x148: ${out("unseen_mass")} vs $gt")
    // keep rate must match the x80 card's keep fraction
    val keeps = SparkEntry.queries("x80_gopher_rule_card")(spark, sf0001)
      .collect()
    val rate = math.rint(10000.0 * 2 * keeps.count(r =>
      r.getBoolean(r.length - 1)) / keeps.length / 2) / 10000.0
    assert(math.abs(out("gopher_keep_rate") - rate) < 1e-9,
      s"x200 vs x80: ${out("gopher_keep_rate")} vs $rate")
  }
}
