package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions75

/** Batch-75 invariants: KS reads D=1 on disjoint supports and locates
  * a planted shift boundary; Kish ESS is n under equal weights and
  * collapses under a dominant one.
  */
class Extensions75Spec extends SparkSpec {

  test("x182 planted: disjoint supports read D = 1 at the lower arm's top value") {
    import spark.implicits._
    // find md5 parities to plant arms deliberately
    import graft.functions.HashFunctions
    val parity = (1L to 60L).map { u =>
      val p = Seq(u).toDF("u")
        .select(pmod(HashFunctions.md5_bucket60(col("u").cast("string")),
          lit(2L)).as("p")).collect().head.getLong(0)
      u -> p
    }.toMap
    val ctrl = (1L to 60L).filter(parity(_) == 0L).take(5)
    val trt = (1L to 60L).filter(parity(_) == 1L).take(5)
    // control values 1..5 dollars; treatment 100.. dollars: disjoint
    val rows = ctrl.zipWithIndex.map { case (u, i) => (u, (i + 1).toDouble) } ++
      trt.zipWithIndex.map { case (u, i) => (u, 100.0 + i) }
    val out = Extensions75.ksTest(rows.toDF("user_id", "value"),
      "user_id", "value").collect().head
    assert(out.getLong(0) == 5 && out.getLong(1) == 5)
    assert(out.getDouble(2) == 1.0, s"disjoint -> D = 1: $out")
    assert(out.getDouble(3) == 5.0, s"gap peaks at control's max: $out")
  }

  test("x183 planted: equal weights give ESS = n; a whale collapses it") {
    import spark.implicits._
    val eq = (1 to 10).map(i => ("a", 2.0))
    val whale = (1 to 9).map(i => ("b", 0.001)) :+ (("b", 1000.0))
    val out = Extensions75.kishEss((eq ++ whale).toDF("g", "w"), "g", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(2) == 10.0 && out("a").getDouble(3) == 1.0,
      s"equal weights: ${out("a")}")
    assert(out("b").getDouble(2) < 1.1, s"one whale -> ESS ~ 1: ${out("b")}")
  }

  test("x182/x183 fixtures: A/A lambda modest; efficiencies in (0,1]") {
    val ks = SparkEntry.queries("x182_ks_test")(spark, sf0001).collect().head
    assert(ks.getLong(0) + ks.getLong(1) == 15L)
    assert(ks.getDouble(2) >= 0.0 && ks.getDouble(2) <= 1.0)
    val ess = SparkEntry.queries("x183_kish_ess")(spark, sf0001).collect()
    assert(ess.nonEmpty)
    ess.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0 + 1e-9, s"$r")
      assert(r.getDouble(2) <= r.getLong(1).toDouble + 1e-6)
    }
  }
}
