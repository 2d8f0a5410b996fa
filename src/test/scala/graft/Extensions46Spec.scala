package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions26, Extensions32, Extensions46}

/** Batch-46 invariants: the confusion card's exact cell arithmetic and
  * its agreement with the x105 walk; DiD accounting identities
  * (delta = post − pre, effect = Δtreat − Δcontrol, units conserved).
  */
class Extensions46Spec extends SparkSpec {

  private def gateAt(t: Long) = {
    import spark.implicits._
    Seq(Tuple1(t)).toDF("threshold_micro")
  }

  test("x125 planted: balanced 2x2 confusion at threshold 0") {
    import spark.implicits._
    val scored = Seq(
      (0L, true, 1000000L), (1L, false, 1000000L),
      (2L, true, -1000000L), (3L, false, -1000000L))
      .toDF("doc_id", "label", "margin_micro")
    val r = Extensions46.classifierReport(scored, "margin_micro", "label",
      gateAt(0L)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((1L, 1L, 1L, 1L)))
    Seq(5, 6, 7, 8).foreach(i => assert(r.getDouble(i) == 0.5, s"col $i: $r"))
  }

  test("x125 planted: a perfect separation scores 1.0 everywhere") {
    import spark.implicits._
    val scored = Seq((0L, true, 500000L), (1L, true, 700000L),
      (2L, false, -500000L)).toDF("doc_id", "label", "margin_micro")
    val r = Extensions46.classifierReport(scored, "margin_micro", "label",
      gateAt(0L)).collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    Seq(5, 6, 7, 8).foreach(i => assert(r.getDouble(i) == 1.0))
  }

  test("x125 planted: gate above every margin -> no predictions, null precision, 0 recall") {
    import spark.implicits._
    val scored = Seq((0L, true, 100L), (1L, false, -100L))
      .toDF("doc_id", "label", "margin_micro")
    val r = Extensions46.classifierReport(scored, "margin_micro", "label",
      gateAt(1000000L)).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.isNullAt(6), "precision undefined with no predicted positives")
    assert(r.getDouble(7) == 0.0, "recall is 0, not null (positives exist)")
  }

  test("x125 fixture: the card agrees with the x105 walk it deploys") {
    val card = SparkEntry.queries("x125_classifier_report")(spark, sf0001)
      .collect().head
    val scored = SparkEntry.queries("x94_quality_logreg")(spark, sf0001)
    val walk = Extensions32.calibrateThreshold(
      scored, "margin_micro", "label", 900).collect().head
    assert(card.getLong(0) == walk.getLong(0), "same threshold")
    assert(card.getLong(1) + card.getLong(2) == walk.getLong(1),
      "tp + fp = rows kept by the gate")
    assert(card.getDouble(6) == walk.getDouble(2), "identical precision")
    assert(card.getDouble(7) == walk.getDouble(3), "identical recall")
    assert(card.getDouble(6) >= 0.9, "the calibrated gate meets its target")
  }

  test("x126 planted: accounting identities against a hand-mirrored arm split") {
    import spark.implicits._
    // 20 users, 2 events each: pre = 10.00, post = 10.00 + user cents
    val rows = (1L to 20L).flatMap { u =>
      Seq((u, "2024-01-10 00:00:00", 10.0), (u, "2024-01-20 00:00:00", 10.0 + u / 100.0))
    }
    val ev = rows.toDF("user_id", "ts0", "value")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"), col("value"),
        lit(0L).as("event_id"), lit("t").as("event_type"), lit("{}").as("props"))
    val out = Extensions46.didReadout(ev, "user_id", "ts", "value",
      "2024-01-15 00:00:00").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).sum == 20L, "units conserved across arms")
    // mirror the md5-permille arm split in plain JVM code
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "control" else "treatment"
    }
    val byArm = (1L to 20L).groupBy(arm)
    out.foreach { r =>
      val users = byArm(r.getString(0))
      assert(r.getLong(1) == users.size.toLong)
      val meanDelta = users.map(_.toDouble / 100.0).sum / users.size
      assert(math.abs(r.getDouble(4) - meanDelta) < 1e-4,
        s"mean_delta ${r.getDouble(4)} vs $meanDelta")
      assert(math.abs(r.getDouble(3) - r.getDouble(2) - r.getDouble(4)) < 2e-4,
        "delta = post - pre")
    }
    val t = out.find(_.getString(0) == "treatment").get.getDouble(4)
    val c = out.find(_.getString(0) == "control").get.getDouble(4)
    val eff = out.head.getDouble(5)
    assert(math.abs(eff - (t - c)) < 2e-4, s"effect $eff vs ${t - c}")
  }

  test("x126 fixture: effect/se/t constant across rows; t = effect/se") {
    val out = SparkEntry.queries("x126_did_readout")(spark, sf0001).collect()
    assert(out.length == 2)
    assert(out.map(_.getDouble(5)).distinct.length == 1)
    assert(out.map(_.getDouble(6)).distinct.length == 1)
    val r = out.head
    assert(r.getDouble(6) > 0.0)
    assert(math.abs(r.getDouble(7) - r.getDouble(5) / r.getDouble(6)) < 1e-3,
      "t is effect over se (both in the same units)")
  }
}
