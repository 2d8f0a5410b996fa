package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions25
import java.sql.Timestamp

/** Batch-25 invariants beyond the value-level oracles. */
class Extensions25Spec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def log(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.map { case (u, t, at, id) => (u, t, ts(at), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
  }

  // ---- x91 timeline surprisal -------------------------------------------------

  test("x91 planted outlier: the one user taking improbable transitions scores highest") {
    // 9 users do a->b; 1 user does a->c: p(c|a)=0.1 is the rare move
    val rows = (1L to 9L).flatMap(u => Seq(
      (u, "a", "2024-01-01 10:00:00", u * 10),
      (u, "b", "2024-01-01 10:01:00", u * 10 + 1))) ++ Seq(
      (10L, "a", "2024-01-01 10:00:00", 100L),
      (10L, "c", "2024-01-01 10:01:00", 101L))
    val out = Extensions25.timelineSurprisal(log(rows: _*),
      "user_id", "event_type", "ts", "event_id").collect()
    val best = out.maxBy(_.getDouble(2))
    assert(best.getLong(0) == 10L, "the a->c user must be the anomaly")
    // exact surprisals: -ln(0.9) vs -ln(0.1)
    assert(math.abs(best.getDouble(2) - (-math.log(0.1))) < 1e-3)
    assert(out.filter(_.getLong(0) != 10L)
      .forall(r => math.abs(r.getDouble(2) - (-math.log(0.9))) < 1e-3))
  }

  test("x91 fixture: surprisal is positive and transition counts conserve") {
    val rows = SparkEntry.queries("x91_timeline_surprisal")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0.0), "-ln p > 0 for p < 1")
    val e = spark.read.parquet(s"$sf0001/events.parquet")
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  // ---- x92 SCD2 ----------------------------------------------------------------

  test("x92 planted stream: consecutive duplicates collapse, intervals tile") {
    val events = log(
      (1L, "active", "2024-01-01 10:00:00", 1L),
      (1L, "active", "2024-01-01 11:00:00", 2L), // same state: collapsed
      (1L, "idle", "2024-01-01 12:00:00", 3L),
      (1L, "active", "2024-01-01 13:00:00", 4L), // state can recur
      (2L, "idle", "2024-01-01 10:00:00", 5L))
    val out = Extensions25.scd2History(events, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "valid_from").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("active", "idle", "active"))
    // intervals tile: each valid_to equals the next valid_from
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(3) == b.getTimestamp(2))
    }
    assert(u1.last.isNullAt(3) && u1.last.getBoolean(4))
    assert(u1.init.forall(!_.getBoolean(4)))
    assert(out.filter(_.getLong(0) == 2L).map(_.getBoolean(4)).toSeq == Seq(true))
  }

  test("x92 fixture: exactly one open row per user; intervals never overlap") {
    val rows = SparkEntry.queries("x92_scd2_history")(spark, sf0001).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      assert(rs.count(_.getBoolean(4)) == 1, "one current row per user")
      val sorted = rs.sortBy(_.getTimestamp(2).getTime)
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getTimestamp(3).getTime <= b.getTimestamp(2).getTime ||
          a.getTimestamp(3) == b.getTimestamp(2))
      }
    }
    // the open states are exactly q32's latest states
    val latest = SparkEntry.queries("q32_latest_state")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type")).toMap
    val open = rows.filter(_.getBoolean(4)).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(open == latest, "SCD2 open rows must agree with the latest-state fold")
  }

  // ---- x93 PSI drift -----------------------------------------------------------

  test("x93 identical snapshots give (near-)zero PSI; a real shift does not") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val same = Extensions25.psiDrift(d, d, "n_chars").collect()
    assert(same.forall(r => math.abs(r.getDouble(4)) < 1e-9),
      "identical distributions have PSI = 0 (shares identical, smoothing included)")
    val shifted = d.withColumn("n_chars", col("n_chars") * 3L)
    val out = Extensions25.psiDrift(d, shifted, "n_chars").collect()
    assert(out.head.getDouble(4) > 0.25, "a 3x length shift is actionable drift")
  }

  test("x93 an empty-on-one-side bucket stays finite (smoothing floor)") {
    import spark.implicits._
    val prev = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    // next is entirely in prev's top decile: 9 buckets empty on the next side
    val next = (1L to 100L).map(i => (i, 990L + (i % 10))).toDF("id", "v")
    val out = Extensions25.psiDrift(prev, next, "v").collect()
    assert(out.forall(r => !r.getDouble(3).isInfinite && !r.getDouble(3).isNaN),
      "add-half smoothing must keep every contribution finite")
    assert(out.head.getDouble(4) > 1.0, "near-disjoint distributions are extreme drift")
  }

  test("x93 shares sum to ~1 on both sides") {
    val rows = SparkEntry.queries("x93_psi_drift")(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(math.abs(rows.map(_.getDouble(1)).sum - 1.0) < 0.01)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
  }
}
