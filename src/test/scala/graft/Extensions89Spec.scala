package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions89

/** Batch-89 invariants: the trade matrix reproduces a hand-built
  * two-nation flow; promo share splits planted revenue exactly.
  */
class Extensions89Spec extends SparkSpec {

  test("x207 planted: a hand-built two-nation flow") {
    import spark.implicits._
    val nations = Seq((0, "ALPHA"), (1, "BETA")).toDF("n_nationkey", "n_name")
    val customers = Seq((1L, 0), (2L, 1)).toDF("c_custkey", "c_nationkey")
    val suppliers = Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((100L, 1L), (200L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitems = Seq(
      (100L, 10L, 100.0, 0.0),    // ALPHA buys ALPHA: 100
      (100L, 11L, 50.0, 0.0),     // ALPHA buys BETA: 50
      (200L, 11L, 40.0, 0.5))     // BETA buys BETA: 20 net
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Extensions89.tradeFlowMatrix(orders, lineitems, customers,
      suppliers, nations).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("ALPHA", "ALPHA")).getDouble(2) == 100.0)
    assert(out(("ALPHA", "BETA")).getDouble(2) == 50.0)
    assert(out(("ALPHA", "ALPHA")).getDouble(3) == 0.6667, "100/150")
    assert(out(("BETA", "BETA")).getDouble(2) == 20.0)
    assert(out(("BETA", "BETA")).getDouble(3) == 1.0)
  }

  test("x208 planted: promo revenue splits exactly") {
    import spark.implicits._
    val parts = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val items = Seq(
      (1L, 60.0, 0.0, "2024-01-10"), (2L, 40.0, 0.0, "2024-01-20"),
      (1L, 10.0, 0.0, "2024-02-05"))
      .toDF("l_partkey", "l_extendedprice", "l_discount", "s0")
      .withColumn("l_shipdate", to_timestamp(col("s0")))
    val out = Extensions89.promoShare(items, parts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("2024-01").getDouble(3) == 0.6, "60 of 100")
    assert(out("2024-02").getDouble(3) == 1.0)
  }

  test("x207/x208 fixtures: matrix rows share to ~1 per nation; promo share sane") {
    val m = SparkEntry.queries("x207_trade_flow")(spark, sf0001).collect()
    val byNation = m.groupBy(_.getString(0))
    byNation.foreach { case (n, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"$n row shares ~1: $s")
    }
    val p = SparkEntry.queries("x208_promo_share")(spark, sf0001).collect()
    assert(p.nonEmpty)
    p.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }
}
