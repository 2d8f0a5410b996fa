package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions138

/** Batch-138 invariants: the learning curve's n_train grows with the
  * fraction and the full-data Brier is no worse than the quarter-data
  * one on a separable fixture; MDE shrinks with √n; SRM flags a
  * planted 90/10 split and passes the honest md5 split.
  */
class Extensions138Spec extends SparkSpec {

  test("learningCurve: monotone n_train, more data does not hurt a separable task") {
    import spark.implicits._
    val labeled = spark.range(0, 300)
      .select(col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit("good text here"))
          .otherwise(lit("bad junk there")).as("text"),
        (pmod(col("id"), lit(2)) === 0).cast("long").as("label"))
    val rows = Extensions138.learningCurve(labeled, "id", "text", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(250L, 500L, 750L, 1000L))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      s"n_train monotone in fraction: ${rows.toSeq}")
    assert(rows.last._3 <= rows.head._3,
      s"full-data Brier <= quarter-data Brier on a separable task: ${rows.toSeq}")
  }

  test("mdeCard: MDE shrinks like 1/sqrt(n) when variance is held fixed") {
    import spark.implicits._
    def card(n: Int) = Extensions138.mdeCard(
      spark.range(0, n).select((pmod(col("id"), lit(2)) * 100).as("cents")),
      "cents").head
    val small = card(100)
    val big = card(400)
    assert(small.getLong(4) > big.getLong(4),
      s"4x units must shrink the MDE: ${small.getLong(4)} vs ${big.getLong(4)}")
    // variance of a fair 0/100-cent coin is 2500 cents^2 on both
    assert(math.abs(small.getLong(3) - 2500000000L) < 200000000L, s"$small")
  }

  test("srmCheck: honest md5 split passes, a planted biased split flags") {
    import spark.implicits._
    val honest = Extensions138.srmCheck(
      spark.range(0, 5000).toDF("u"), "u").head
    assert(!honest.getBoolean(4), s"an md5 50/50 split must not flag: $honest")
    assert(honest.getLong(1) + honest.getLong(2) == honest.getLong(0))
    // salt "s21:" sends all 8 units 0..7 to one arm (precomputed md5
    // fact) — the guardrail must flag the 8/0 split
    val biased = Extensions138.srmCheck(
      spark.range(0, 8).toDF("u"), "u", saltPrefix = "s21:").head
    assert(biased.getBoolean(4), s"an 8/0 split must flag: $biased")
  }
}
