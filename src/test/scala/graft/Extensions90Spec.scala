package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions90

/** Batch-90 invariants: segment mix splits a planted year exactly and
  * fixture year shares sum to 1.
  */
class Extensions90Spec extends SparkSpec {

  test("x209 planted: exact split within a year") {
    import spark.implicits._
    val customers = Seq((1L, "AUTO"), (2L, "RETAIL")).toDF(
      "c_custkey", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, 300.0, "1995-02-01"), (2L, 2L, 100.0, "1995-08-01"),
      (3L, 1L, 50.0, "1996-01-01"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d0")
      .withColumn("o_orderdate", to_timestamp(col("d0")))
    val out = Extensions90.segmentRevenueMix(orders, customers).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(out((1995L, "AUTO")).getDouble(3) == 0.75)
    assert(out((1995L, "RETAIL")).getDouble(3) == 0.25)
    assert(out((1996L, "AUTO")).getDouble(3) == 1.0)
  }

  test("x209 fixture: year shares sum to ~1") {
    val out = SparkEntry.queries("x209_segment_mix")(spark, sf0001).collect()
    out.groupBy(_.getLong(0)).foreach { case (y, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"$y: $s")
    }
  }
}
