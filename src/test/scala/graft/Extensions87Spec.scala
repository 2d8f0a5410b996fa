package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions87

/** Batch-87 invariants: sourcing buckets and exposed revenue are
  * exact; lead times read hand-planted day gaps and flag the SLA
  * boundary strictly.
  */
class Extensions87Spec extends SparkSpec {

  test("x204 planted: buckets and revenue shares exact") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 50.0),                       // part 1: single supplier
      (2L, 10L, 20.0), (2L, 11L, 20.0),      // part 2: dual
      (3L, 10L, 2.0), (3L, 11L, 4.0), (3L, 12L, 4.0)) // part 3: multi
    val out = Extensions87.sourcingRiskProfile(rows.toDF("p", "s", "v"),
      "p", "s", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(out("1_single").getLong(1) == 1 &&
      out("1_single").getDouble(2) == 50.0)
    assert(out("2_dual").getDouble(2) == 40.0)
    assert(out("3_multi").getDouble(2) == 10.0)
    assert(out("1_single").getDouble(3) == 0.5, "half the money is fragile")
  }

  test("x205 planted: hand-timed lead times; SLA strict at the boundary") {
    import spark.implicits._
    val orders = Seq(
      (1L, "1-URGENT", "1995-01-01"), (2L, "5-LOW", "1995-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "d0")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_timestamp(col("d0")).as("o_orderdate"))
    val items = Seq(
      (1L, "1995-01-11"), (1L, "1995-01-21"),    // 10, 20 days
      (2L, "1995-04-01"), (2L, "1995-04-02"))    // 90, 91 days
      .toDF("l_orderkey", "s0")
      .select(col("l_orderkey"), to_timestamp(col("s0")).as("l_shipdate"))
    val out = Extensions87.leadTimeCard(orders, items, slaDays = 90L)
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("1-URGENT")
    assert(u.getDouble(2) == 15.0 && u.getDouble(4) == 0.0, s"$u")
    val l = out("5-LOW")
    assert(l.getDouble(2) == 90.5, s"median of 90 and 91: $l")
    assert(l.getLong(1) == 2 && l.getDouble(4) == 0.5,
      s"exactly-90 is NOT late (strict >), 91 is: $l")
  }

  test("x204/x205 fixtures: shares sum ~1; every priority reports") {
    val sr = SparkEntry.queries("x204_sourcing_risk")(spark, sf0001)
      .collect()
    assert(math.abs(sr.map(_.getDouble(3)).sum - 1.0) < 0.001)
    val lt = SparkEntry.queries("x205_lead_time")(spark, sf0001).collect()
    assert(lt.length == 5)
    lt.foreach(r => assert(r.getDouble(3) >= r.getDouble(2), s"$r"))
  }
}
