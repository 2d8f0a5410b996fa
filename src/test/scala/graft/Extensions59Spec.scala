package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions59

/** Batch-59 invariants: the profile counts nulls/distincts exactly and
  * slots stats into the right typed columns; winsorization clamps a
  * planted whale to the p99 bound and leaves clean data untouched.
  */
class Extensions59Spec extends SparkSpec {

  test("x150 planted: nulls, distincts, and the quantized mean are exact") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2.5), Some("b")),
      (Some(2L), Some(2.5), Some("a")),
      (Some(2L), None, None),
      (None, Some(5.0), Some("c")))
      .toDF("k", "v", "s")
    val out = Extensions59.tableProfile(df, exactDistinct = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("k", "v", "s"))
    val k = out("k")
    assert(k.getLong(2) == 4 && k.getLong(3) == 1 && k.getLong(4) == 2)
    assert(k.getDouble(5) == 1.0 && k.getDouble(6) == 2.0)
    assert(k.isNullAt(7) && k.isNullAt(8))
    assert(k.getDouble(9) == 1.6667, s"quantized mean 5/3 -> 1.6667: $k")
    val v = out("v")
    assert(v.getLong(3) == 1 && v.getLong(4) == 2)
    assert(v.getDouble(9) == 3.3333, s"quantized mean 10/3 -> 3.3333: $v")
    val s = out("s")
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(9))
    assert(s.getString(7) == "a" && s.getString(8) == "c")
  }

  test("x150 fixture: six orders columns, numeric and string slots disjoint") {
    val out = SparkEntry.queries("x150_table_profile")(spark, sf0001).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val numeric = !r.isNullAt(5)
      val stringy = !r.isNullAt(7)
      assert(numeric ^ stringy, s"exactly one slot family: $r")
      assert(r.getLong(3) == 0L, s"fixture has no nulls: $r")
    }
  }

  test("x150 scale shapes: approx card is ONE pass with no Expand; exact path has no Expand either (per-column pruned passes); HLL distincts within 3x rsd of exact") {
    val orders = graft.model.Tables.load(spark, sf0001, "orders")
    val approx = Extensions59.tableProfile(orders)
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"approx card must not pay the multi-distinct Expand:\n$approxPlan")
    val exact = Extensions59.tableProfile(orders, exactDistinct = true)
    val exactPlan = exact.queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      s"exact path must run per-column pruned passes, not Expand:\n$exactPlan")
    val ex = exact.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    approx.collect().foreach { r =>
      val (c, nd) = (r.getString(0), r.getLong(4))
      val e = ex(c)
      assert(math.abs(nd - e) <= math.max(2L, (e * 0.06).toLong),
        s"HLL estimate for $c drifted: $nd vs exact $e")
    }
  }

  test("x151 planted: the whale clamps to p99; symmetric arms read ~zero diff") {
    import spark.implicits._
    // users 1..40, one event each, value 10.0 — except user 7 spends 10000
    val df = (1L to 40L).map { u =>
      (u, if (u == 7L) 10000.0 else 10.0)
    }.toDF("user_id", "value")
    val out = Extensions59.winsorizedReadout(df, "user_id", "value").collect()
    assert(out.length == 1)
    val r = out.head
    val (mc, mt) = (r.getDouble(6), r.getDouble(7))
    // whichever arm holds user 7, its winsorized mean must stay near 10
    // (the raw mean of that arm would exceed 500)
    assert(mc < 500.0 && mt < 500.0, s"whale clamped: $r")
    assert(r.getLong(0) + r.getLong(1) == 40L)
  }

  test("x151 planted: constant data is a fixed point (bounds = value, diff = 0)") {
    import spark.implicits._
    val df = (1L to 30L).map(u => (u, 25.0)).toDF("user_id", "value")
    val out = Extensions59.winsorizedReadout(df, "user_id", "value")
      .collect().head
    assert(out.getDouble(6) == 25.0 && out.getDouble(7) == 25.0 &&
      out.getDouble(8) == 0.0, s"fixed point: $out")
    assert(out.getDouble(2) == 25.0 && out.getDouble(5) == 25.0)
  }
}
