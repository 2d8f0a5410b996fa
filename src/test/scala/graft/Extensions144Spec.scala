package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions144

/** Batch-144 invariants: BH's step-up cutoff on a hand-computed
  * p table; winsorization clips exactly the planted whale.
  */
class Extensions144Spec extends SparkSpec {

  test("bhFdr: hand-computed step-up cutoff, step-up rescues a middle p") {
    import spark.implicits._
    // m=4, alpha=50‰: thresholds i/m*alpha = 12500, 25000, 37500, 50000 micro.
    // p = (10000, 30000, 35000, 900000): p1 ok; p2 NOT (30000>25000);
    // p3 ok (35000<=37500) -> step-up rejects ranks 1..3 including p2.
    val df = Seq((1L, 10000L), (2L, 30000L), (3L, 35000L), (4L, 900000L))
      .toDF("id", "p")
    val got = Extensions144.bhFdr(df, "id", "p")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false),
      s"step-up must rescue rank 2: $got")
  }

  test("bhFdr: nothing rejected when every p is large") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, 500000L + i)).toDF("id", "p")
    val got = Extensions144.bhFdr(df, "id", "p").collect()
    assert(got.forall(!_.getBoolean(3)), "no discoveries at p ~ 0.5")
  }

  test("winsorizedMean: the planted whale clips to the hi cut") {
    import spark.implicits._
    // 99 values of 1.00 + one 10000.00 whale; lo=10%, hi=990%.
    // n=100: klo=1 -> lo=100c; khi=99 -> hi=100c; whale clamps to 100c.
    val df = ((1 to 99).map(_ => 1.0d) :+ 10000.0d).toDF("value")
    val r = Extensions144.winsorizedMean(df, "value").head
    assert(r.getLong(0) == 100L, s"$r")
    assert(r.getLong(2) == 100L, s"hi cut at the 99th pct: $r")
    assert(r.getLong(4) == 1L, s"exactly the whale clips: $r")
    assert(r.getLong(6) == 100L * 1000000L, s"winsorized mean = 1.00: $r")
    assert(r.getLong(5) > r.getLong(6), "raw mean dominated by the whale")
  }
}
