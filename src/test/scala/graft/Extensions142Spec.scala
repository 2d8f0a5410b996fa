package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions142, Rank}

/** Batch-142 invariants: the distributed prefix sum equals the
  * single-window truth; packing conserves tokens and prices a planted
  * boundary-crosser; U hits its closed forms on identical and fully
  * separated samples; attribution conserves exactly 10⁶ micro per
  * attributed conversion.
  */
class Extensions142Spec extends SparkSpec {

  test("globalPrefixSum: equals the single-window prefix sum, any partitioning") {
    import spark.implicits._
    val df = (1L to 257L).map(i => (i, (i * 7) % 13 + 1)).toDF("id", "v")
      .repartition(7)
    val got = Rank.globalPrefixSum(df, Seq("id"), Seq(false), "v", parts = 5)
      .select(col("id"), col("ps").cast("long").as("ps"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    (1L to 257L).foreach { i =>
      acc += (i * 7) % 13 + 1
      assert(got(i) == acc, s"prefix at id=$i")
    }
  }

  test("packingCard: token conservation and a single long doc crossing chunks") {
    import spark.implicits._
    // one doc of 25 tokens at ctx=10: 3 chunks, the doc crosses, last
    // chunk holds 5 tokens
    val one = Seq((1L, (1 to 25).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Extensions142.packingCard(one, "doc_id", "text", ctxTokens = 10L).head
    assert(r.getLong(0) == 1L && r.getLong(1) == 25L, s"$r")
    assert(r.getLong(2) == 3L, s"chunks: $r")
    assert(r.getLong(3) == 1L, s"the doc must cross: $r")
    assert(r.getLong(5) == 500000L, s"last chunk half full: $r")
  }

  test("packingCard: docs aligned to the context never cross") {
    import spark.implicits._
    val docs = (1L to 6L).map(i =>
      (i, (1 to 10).map(j => s"d${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val r = Extensions142.packingCard(docs, "doc_id", "text", ctxTokens = 10L).head
    assert(r.getLong(1) == 60L && r.getLong(2) == 6L, s"$r")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L, s"aligned docs: $r")
    assert(r.getLong(5) == 1000000L, s"full last chunk: $r")
  }

  test("mannWhitneyU: identical samples read z = 0; full separation maxes U") {
    import spark.implicits._
    val same = Seq(("a", 1.0d), ("a", 2.0d), ("b", 1.0d), ("b", 2.0d))
      .toDF("g", "v")
    val r0 = Extensions142.mannWhitneyU(same, "g", "v", "a", "b").head
    // 2U = na*nb at the null center; z exactly 0
    assert(r0.getLong(2) == 4L && r0.getLong(3) == 0L, s"$r0")
    val sep = Seq(("a", 10.0d), ("a", 11.0d), ("a", 12.0d),
      ("b", 1.0d), ("b", 2.0d), ("b", 3.0d)).toDF("g", "v")
    val r1 = Extensions142.mannWhitneyU(sep, "g", "v", "a", "b").head
    assert(r1.getLong(2) == 18L, s"2U = 2*na*nb when a dominates: $r1")
    assert(r1.getLong(3) > 1500000L, s"z well above 1.5: $r1")
  }

  test("attributionCard: micro conservation and last-touch identity") {
    import spark.implicits._
    // user 1 converts once; 3 prior touches (click, view, click). linear:
    // each floor(1e6/3)=333333, remainder 1 to the LAST touch (the view? no
    // - the latest ts). Touch order: t1 click, t2 view, t3 click (latest).
    val rows = Seq(
      (10L, "2024-01-10 12:00:00", 1L, "purchase", 1.0d),
      (1L, "2024-01-09 10:00:00", 1L, "click", 1.0d),
      (2L, "2024-01-09 11:00:00", 1L, "view", 1.0d),
      (3L, "2024-01-09 12:00:00", 1L, "click", 1.0d),
      // a touch outside the 7-day window never earns credit
      (4L, "2023-12-01 12:00:00", 1L, "click", 1.0d))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = Extensions142.attributionCard(rows, "user_id", "ts",
        "event_type", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got("click") == ((2L, 333333L + 333333L + 1L, 1000000L)), s"$got")
    assert(got("view") == ((1L, 333333L, 0L)), s"$got")
    assert(got.values.map(_._2).sum == 1000000L, "linear credit conserved")
    assert(got.values.map(_._3).sum == 1000000L, "last credit conserved")
  }
}
