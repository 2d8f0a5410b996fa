package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions141

/** Batch-141 invariants: IPS matches a hand-computed two-arm case;
  * a target policy that always picks the better arm scores above the
  * logging average; SNIPS equals IPS when the match rate is exactly
  * the propensity-weighted unit.
  */
class Extensions141Spec extends SparkSpec {

  test("ipsPolicyValue: hand-computed two-arm estimate") {
    import spark.implicits._
    // logs: arm a x4 (rewards 1,1,0,0), arm b x2 (rewards 1,0)
    // target always 'a': matched rewards a = 2, wq_a = 1e6*6/4 = 1.5e6
    // IPS = 2*1.5e6/6 = 500000; matched count = 4 -> SNIPS = 2e6*... :
    // sr = 3e6, sc = 4*1.5e6 = 6e6 -> snips = 500000
    val logs = Seq(
      ("a", 1L), ("a", 1L), ("a", 0L), ("a", 0L), ("b", 1L), ("b", 0L)
    ).toDF("act", "r").withColumn("pi", lit("a"))
    val got = Extensions141.ipsPolicyValue(logs, "act", "r", "pi").head
    assert(got.getLong(0) == 6L && got.getLong(1) == 4L)
    assert(got.getLong(2) == 500000L, s"IPS: $got")
    assert(got.getLong(3) == 500000L, s"SNIPS: $got")
  }

  test("ipsPolicyValue: picking the better arm beats the logging average") {
    import spark.implicits._
    // arm 'good' pays 1 always, arm 'bad' pays 0 always, logged 50/50
    val logs = (0 until 100).map { i =>
      val a = if (i % 2 == 0) "good" else "bad"
      (a, if (a == "good") 1L else 0L)
    }.toDF("act", "r")
    val smart = Extensions141.ipsPolicyValue(
      logs.withColumn("pi", lit("good")), "act", "r", "pi").head
    assert(smart.getLong(2) == 1000000L,
      s"always-good policy is worth the good arm's full reward: $smart")
    val dumb = Extensions141.ipsPolicyValue(
      logs.withColumn("pi", lit("bad")), "act", "r", "pi").head
    assert(dumb.getLong(2) == 0L, s"always-bad is worthless: $dumb")
  }

  test("x320 fixture: estimates within the outcome range, matches present") {
    val r = SparkEntry.queries("x320_ips_policy_value")(spark, sf0001).head
    assert(r.getLong(1) > 0L && r.getLong(1) < r.getLong(0))
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 2000000L)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
  }
}
