package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions78

/** Batch-78 invariants: the funnel arm compare reads a planted
  * conversion gap with the right sign; seasonal strength reads ~1 on
  * a pure weekly pattern and 0 on flat noise-free data.
  */
class Extensions78Spec extends SparkSpec {

  test("x188 planted: a conversion gap between arms signs z correctly") {
    import spark.implicits._
    import graft.functions.HashFunctions
    val parity = (1L to 120L).map { u =>
      val p = Seq(u).toDF("u")
        .select(pmod(HashFunctions.md5_bucket60(col("u").cast("string")),
          lit(2L)).as("p")).collect().head.getLong(0)
      u -> p
    }.toMap
    val ctrl = (1L to 120L).filter(parity(_) == 0L).take(20)
    val trt = (1L to 120L).filter(parity(_) == 1L).take(20)
    // all view; control: 5 click; treatment: 15 click
    def rows(us: Seq[Long], nClick: Int) = us.zipWithIndex.flatMap {
      case (u, i) =>
        Seq((u, "view", "2024-03-01 10:00:00")) ++
          (if (i < nClick) Seq((u, "click", "2024-03-01 11:00:00")) else Nil)
    }
    val ev = (rows(ctrl, 5) ++ rows(trt, 15))
      .toDF("user_id", "event_type", "ts0")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("ts0")).as("ts"))
    val out = Extensions78.funnelArmCompare(ev, "user_id", "event_type",
      "ts", Seq("view", "click"), 24L * 3600 * 1000000).collect().head
    assert(out.getLong(2) == 20 && out.getLong(3) == 5)
    assert(out.getLong(4) == 20 && out.getLong(5) == 15)
    assert(out.getDouble(6) == 0.25 && out.getDouble(7) == 0.75)
    assert(out.getDouble(8) > 2.5, s"treatment lift -> positive z: $out")
  }

  test("x189 planted: a pure weekly pattern reads strength 1; constant data reads 0") {
    import spark.implicits._
    def series(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (f"2024-03-${i + 1}%02d 12:00:00", v)
    }.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
    val weekly = (0 until 28).map(i => if (i % 7 == 2) 50.0 else 10.0)
    val r1 = Extensions78.seasonalStrength(series(weekly), "ts", "value")
      .collect().head
    assert(r1.getDouble(3) == 1.0, s"pure weekly -> strength 1: $r1")
    val const = (0 until 14).map(_ => 10.0)
    val r2 = Extensions78.seasonalStrength(series(const), "ts", "value")
      .collect().head
    // constant: seasonal and residual both 0 -> 0/0 -> NULL strength
    assert(r2.isNullAt(3) || r2.getDouble(3) == 0.0, s"degenerate: $r2")
  }

  test("x188/x189 fixtures: A/A zs modest; strength in [0,1]") {
    val arms = SparkEntry.queries("x188_funnel_arms")(spark, sf0001)
      .collect()
    assert(arms.length == 2)
    val st = SparkEntry.queries("x189_seasonal_strength")(spark, sf0001)
      .collect().head
    assert(st.getDouble(3) >= 0.0 && st.getDouble(3) <= 1.0)
  }
}
