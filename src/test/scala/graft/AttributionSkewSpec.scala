package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions142

/** Planted-hub contracts for x325 (round-14, verdict task 3): the
  * conversion×touch fan-out is measured BEFORE the join and a hub/bot
  * user loud-refuses over the cap instead of silently serializing one
  * key; under the cap the micro ledger still conserves exactly.
  */
class AttributionSkewSpec extends SparkSpec {
  import spark.implicits._

  private def hubEvents(nTouches: Int, nConvs: Int) = {
    // one hub user: nTouches clicks then nConvs purchases, all inside a
    // 7-day window; plus one normal user for contrast
    val hub = (1 to nTouches).map(i =>
      (s"e_t$i", "hub", "click",
        java.sql.Timestamp.valueOf(f"2024-01-10 ${i % 24}%02d:${i % 60}%02d:00"))) ++
      (1 to nConvs).map(i =>
        (s"e_c$i", "hub", "purchase",
          java.sql.Timestamp.valueOf(f"2024-01-12 ${i % 24}%02d:${i % 60}%02d:30")))
    val normal = Seq(
      ("n_t1", "u2", "click", java.sql.Timestamp.valueOf("2024-01-11 10:00:00")),
      ("n_c1", "u2", "purchase", java.sql.Timestamp.valueOf("2024-01-11 11:00:00")))
    (hub ++ normal).toDF("event_id", "user_id", "event_type", "ts")
  }

  test("a hub user over the candidate cap loud-refuses, naming the key") {
    val ev = hubEvents(nTouches = 200, nConvs = 100) // 20000 candidates
    val e = intercept[IllegalArgumentException] {
      Extensions142.attributionCard(ev, "user_id", "ts", "event_type",
        "purchase", maxUserCandidates = 10000L).collect()
    }
    assert(e.getMessage.contains("hub"), e.getMessage)
    assert(e.getMessage.contains("20000"), e.getMessage)
  }

  test("under the cap the ledger conserves exactly 1e6 micro per attributed conversion") {
    val ev = hubEvents(nTouches = 50, nConvs = 20)
    val out = Extensions142.attributionCard(ev, "user_id", "ts",
        "event_type", "purchase", maxUserCandidates = 10000L)
      .agg(sum(col("linear_micro")).as("lin"), sum(col("last_micro")).as("lst"))
      .collect()(0)
    // every conversion has in-window touches here: 20 hub + 1 normal
    assert(out.getLong(0) == 21L * 1000000L, s"linear: ${out.getLong(0)}")
    assert(out.getLong(1) == 21L * 1000000L, s"last: ${out.getLong(1)}")
  }

  test("eventIdCol is honored for conversion/touch identity") {
    val ev = hubEvents(5, 2).withColumnRenamed("event_id", "eid")
    val out = Extensions142.attributionCard(ev, "user_id", "ts",
      "event_type", "purchase", eventIdCol = "eid")
    assert(out.agg(sum(col("last_micro"))).collect()(0).getLong(0) == 3L * 1000000L)
  }
}
