package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions88

/** Batch-88 invariants: the spread reads a hand-planted two-price part
  * exactly and excludes single-sourced parts.
  */
class Extensions88Spec extends SparkSpec {

  test("x206 planted: exact spread; single-sourced parts excluded") {
    import spark.implicits._
    // part 1: supplier 10 sells at $10/unit, supplier 11 at $12/unit
    // part 2: one supplier only
    val rows = Seq(
      (1L, 10L, 100.0, 10.0), (1L, 10L, 50.0, 5.0),
      (1L, 11L, 120.0, 10.0), (1L, 11L, 60.0, 5.0),
      (2L, 10L, 30.0, 3.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val out = Extensions88.priceSpread(rows, "l_partkey", "l_suppkey",
      "l_extendedprice", "l_quantity").collect()
    assert(out.length == 1, "single-sourced part 2 excluded")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 12.0)
    assert(r.getDouble(4) == 0.2, s"(12-10)/10: $r")
  }

  test("x206 fixture: top-20, spreads ordered and positive") {
    val out = SparkEntry.queries("x206_price_spread")(spark, sf0001)
      .collect()
    assert(out.length <= 20 && out.nonEmpty)
    val sp = out.map(_.getDouble(4)).toSeq
    assert(sp.zip(sp.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(2) && r.getDouble(4) >= 0.0)
    }
  }
}
