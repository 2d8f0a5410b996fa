package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions133

/** Batch-133 invariants: pass@k matches hand-computed combinatorics
  * and is monotone in k; AIPW agrees with its own components on a
  * clean (unconfounded) fixture and the guard refuses oversampled
  * tasks; the path card counts exactly and respects the tie order.
  */
class Extensions133Spec extends SparkSpec {

  test("passAtK: hand-computed values, monotone in k, short tasks excluded") {
    import spark.implicits._
    // task A: c=1 of n=4 -> pass@1 = 1/4, pass@2 = 1 - C(3,2)/C(4,2) = 1/2
    // task B: c=0 of n=4 -> 0 at every k
    // task C: c=2 of n=2 -> pass@1 = 1, excluded at k=4 (n < k)
    val samples = Seq(
      ("a", 1L), ("a", 0L), ("a", 0L), ("a", 0L),
      ("b", 0L), ("b", 0L), ("b", 0L), ("b", 0L),
      ("c", 1L), ("c", 1L)
    ).toDF("task", "p")
    val got = Extensions133.passAtK(samples, "task", "p", ks = Seq(1, 2, 4))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((3L, 416667L)), s"mean(1/4, 0, 1): $got")
    assert(got(2L) == ((3L, 500000L)), s"mean(1/2, 0, 1): $got")
    assert(got(4L) == ((2L, 500000L)), s"c excluded, mean(1, 0): $got")
  }

  test("passAtK: loud refusal above the samples-per-task cap") {
    import spark.implicits._
    val big = Seq.tabulate(40)(i => ("t", (i % 2).toLong)).toDF("task", "p")
    val e = intercept[IllegalArgumentException] {
      Extensions133.passAtK(big, "task", "p")
    }
    assert(e.getMessage.contains("maxSamplesPerTask"))
  }

  test("aipwAte: recovers a planted unconfounded effect; estimators agree in sign") {
    import spark.implicits._
    // treatment assigned by id parity (independent of text), outcome =
    // treatment (perfect +1 effect): every estimator must read ~+1.
    val labeled = spark.range(0, 120)
      .select(col("id"),
        concat(lit("tok"), pmod(col("id"), lit(7))).as("text"),
        pmod(col("id"), lit(2)).as("treat"))
      .withColumn("outcome", col("treat"))
    val r = Extensions133.aipwAte(labeled, "id", "text", "treat", "outcome").head
    assert(r.getLong(0) == 120L && r.getLong(1) == 60L)
    val (reg, ipw, dr) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(dr > 500000L, s"DR should read a strong positive effect: $dr")
    assert(reg > 0L && ipw > 0L, s"components agree in sign: reg=$reg ipw=$ipw")
  }

  test("x299 fixture: DR card is comparable to the IPW card's world") {
    val r = SparkEntry.queries("x299_aipw_ate")(spark, sf0001).head
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L && r.getLong(1) < r.getLong(0))
    // the regression-only mean of two [0,1] predictions is hard-bounded;
    // the weighted forms are only clip-bounded (|w| <= 1/clipLo = 100)
    assert(math.abs(r.getLong(2)) <= 1000000L, s"reg out of range: $r")
    Seq(3, 4).foreach { i =>
      assert(math.abs(r.getLong(i)) <= 100000000L, s"col $i out of clip bound: $r")
    }
  }

  test("eventPathCard: exact counts and (ts, tie) ordering") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L),
      (2L, "a", 10L, 3L), (2L, "b", 20L, 4L),
      (3L, "b", 10L, 6L), (3L, "a", 10L, 5L) // same ts: tie decides a<b
    ).toDF("u", "et", "ts", "eid")
    val got = Extensions133.eventPathCard(ev, "u", "et", "ts", "eid",
        depth = 2, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b" -> 3L), s"tie-break must order user 3 as a>b: $got")
  }
}
