package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions60

/** Batch-60 invariants: the bot card flags a planted metronome and
  * leaves organic traffic clean (single-event users degrade to NULLs);
  * WoE/IV reads high on a perfect separator and ~zero on an
  * uninformative feature.
  */
class Extensions60Spec extends SparkSpec {

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "ts0", "event_type")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"),
        col("event_type"))
  }

  test("x152 planted: a metronomic single-type user flags; organic traffic doesn't") {
    // bot: 200 clicks exactly 1s apart (rate 86400/day, entropy 0)
    val bot = (0 until 200).map { i =>
      (7L, f"2024-03-01 10:${i / 60}%02d:${i % 60}%02d.000", "click")
    }
    // organic: 5 events over 2 days, mixed types
    val organic = Seq(
      (1L, "2024-03-01 09:00:00.000", "view"), (1L, "2024-03-01 15:00:00.000", "click"),
      (1L, "2024-03-02 09:30:00.000", "purchase"), (1L, "2024-03-02 18:00:00.000", "view"),
      (1L, "2024-03-03 08:00:00.000", "error"))
    // singleton: one event -> NULL gap stats, not suspect
    val single = Seq((9L, "2024-03-01 12:00:00.000", "view"))
    val out = Extensions60.botScoreCard(ev(bot ++ organic ++ single: _*),
      "user_id", "ts", "event_type").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(7L).getBoolean(7), s"metronome flagged: ${out(7L)}")
    assert(out(7L).getDouble(6) == 0.0, "single event type -> entropy 0")
    assert(!out(1L).getBoolean(7), s"organic clean: ${out(1L)}")
    assert(out(1L).getDouble(6) > 1.0, "5 distinct types -> entropy > 1 nat")
    assert(out(9L).isNullAt(4) && out(9L).isNullAt(5) && !out(9L).getBoolean(7),
      s"singleton degrades to NULLs: ${out(9L)}")
  }

  test("x152 planted: exact cadence arithmetic (1s gaps, MAD 0)") {
    val bot = (0 until 61).map(i =>
      (3L, f"2024-03-01 10:00:00.000", "click")).zipWithIndex.map {
      case ((u, _, t), i) => (u, f"2024-03-01 10:${i / 60}%02d:${i % 60}%02d.000", t)
    }
    val out = Extensions60.botScoreCard(ev(bot: _*), "user_id", "ts",
      "event_type").collect().head
    assert(out.getDouble(4) == 1.0 && out.getDouble(5) == 0.0,
      s"median gap 1s, MAD 0: $out")
  }

  test("x153 planted: a perfect separator reads high IV; noise reads ~0") {
    import spark.implicits._
    // feature = 100·label + small jitter: buckets above the median are
    // pure positives, below pure negatives
    val good = (1 to 100).map(i => (1000.0 + i, 1)) ++
      (1 to 100).map(i => (10.0 + i % 7, 0))
    val noise = (1 to 200).map(i => ((i % 13).toDouble, i % 2))
    val sep = Extensions60.woeIv(good.toDF("f", "y"), "f", "y").collect()
    val ivSep = sep.head.getDouble(5)
    assert(sep.map(_.getDouble(5)).forall(_ == ivSep), "total repeats")
    assert(ivSep > 2.0, s"perfect separation -> IV >> 0.5: $ivSep")
    val flat = Extensions60.woeIv(noise.toDF("f", "y"), "f", "y").collect()
    assert(flat.head.getDouble(5) < 0.1,
      s"uninformative feature -> IV ~ 0: ${flat.head}")
  }

  test("x153 fixture: bucket partition is complete and IV is non-negative") {
    val out = SparkEntry.queries("x153_woe_iv")(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 5)
    assert(out.map(_.getLong(1)).sum == 500L, "buckets partition the corpus")
    assert(out.head.getDouble(5) >= 0.0)
  }
}
