package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions85

/** Batch-85 invariants: the rolling monitor pages on a planted spike,
  * stays silent on steady data, and takes the zero-variance branch;
  * the basket profile's histogram and AOV are exact.
  */
class Extensions85Spec extends SparkSpec {

  private def daySeries(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (f"2024-03-${i + 1}%02d 12:00:00", v)
    }.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
  }

  test("x201 planted: a spike pages; noisy-steady stays quiet; zero variance branch") {
    // noisy but tame 14 days, then a 10x spike
    val vals = (0 until 14).map(i => 10.0 + (i % 3)) :+ 200.0
    val out = Extensions85.rollingZAnomalies(daySeries(vals), "ts", "value")
      .collect()
    assert(out.length == 8, "days 8..15 have full trailing windows")
    val alerts = out.filter(_.getBoolean(4)).map(_.getString(0)).toSeq
    assert(alerts == Seq("2024-03-15"), s"only the spike pages: $alerts")
    // constant series: zero variance -> any deviation alerts
    val cvals = Seq.fill(8)(5.0) :+ 6.0
    val c = Extensions85.rollingZAnomalies(daySeries(cvals), "ts", "value")
      .collect()
    val last = c.last
    assert(last.isNullAt(3) && last.getBoolean(4),
      s"zero-variance deviation pages with NULL z: $last")
    assert(c.init.forall(!_.getBoolean(4)))
  }

  test("x202 planted: exact histogram and per-size AOV") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0),         // size 2, $10
      (2L, 10L, 3.0), (2L, 12L, 3.0),         // size 2, $6
      (3L, 13L, 7.0))                          // size 1, $7
    val out = Extensions85.basketSizeProfile(rows.toDF("o", "i", "v"),
      "o", "i", "v").collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getDouble(3) == 7.0)
    assert(out(2L).getLong(1) == 2 && out(2L).getDouble(3) == 8.0,
      s"avg of 10 and 6: ${out(2L)}")
    assert(out(2L).getDouble(2) == 0.6667)
  }

  test("x201/x202 fixtures: monitor covers the tail days; histogram conserves orders") {
    val mon = SparkEntry.queries("x201_rolling_z")(spark, sf0001).collect()
    assert(mon.length == 23, "30 fixture days - 7 warmup")
    val bp = SparkEntry.queries("x202_basket_profile")(spark, sf0001)
      .collect()
    val nOrders = graft.model.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    assert(bp.map(_.getLong(1)).sum == nOrders,
      "histogram conserves the orders that HAVE lineitems")
  }
}
