package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions53

/** Batch-53 invariants: the decomposition reproduces planted structure
  * exactly (constant → all-zero components; pure weekly pattern →
  * zero residual; a planted spike → exactly that day flagged), and the
  * robust outlier gate survives the contamination that breaks
  * mean/stddev (plus the MAD=0 degenerate branch).
  */
class Extensions53Spec extends SparkSpec {

  private def daySeries(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex
      .map { case (v, i) => (f"2024-03-${i + 1}%02d 12:00:00", v) }
      .toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
  }

  test("x138 planted: constant series decomposes to zero seasonal and residual, no anomaly") {
    val out = Extensions53.seasonalDecompose(daySeries(Seq.fill(14)(10.0)),
      "ts", "value").collect()
    assert(out.length == 14)
    // edge days (first/last 3) have no full window -> NULL components
    val (edge, core) = out.partition(r => r.isNullAt(2))
    assert(edge.length == 6 && core.length == 8)
    core.foreach { r =>
      assert(r.getDouble(2) == 10.0, s"trend = the constant: $r")
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0, s"flat: $r")
    }
    assert(out.forall(!_.getBoolean(5)), "0 > 3*0 is false: nothing flagged")
  }

  test("x138 planted: a pure weekly pattern is absorbed entirely by the seasonal index") {
    // 10 everywhere, 15 on day-index 5 of each week: 7-periodic
    val vals = (0 until 21).map(i => if (i % 7 == 5) 15.0 else 10.0)
    val out = Extensions53.seasonalDecompose(daySeries(vals), "ts", "value")
      .collect().filter(r => !r.isNullAt(4))
    assert(out.nonEmpty)
    // centered MA of a 7-periodic series is the period mean: 75/7 -> 10.7143
    assert(out.forall(_.getDouble(2) == 10.7143), "constant trend")
    assert(out.forall(_.getDouble(4) == 0.0),
      s"residual 0 everywhere: ${out.toSeq}")
    assert(out.forall(!_.getBoolean(5)))
  }

  test("x138 planted: a single spike is flagged exactly once, at the spiked day") {
    val vals = (0 until 28).map(i => if (i == 14) 110.0 else 10.0) // day 15
    val out = Extensions53.seasonalDecompose(daySeries(vals), "ts", "value")
      .collect()
    val flagged = out.filter(_.getBoolean(5))
    assert(flagged.map(_.getString(0)).toSeq == Seq("2024-03-15"),
      s"only the planted day: ${flagged.map(_.getString(0)).toSeq}")
  }

  test("x139 planted: MAD gate flags the contaminant mean/stddev would absorb") {
    import spark.implicits._
    // group a: 21 spread values + one wild point; MAD = 5.5 -> gate at
    // |x-med| > 3500*mad4/1349/2 cents = $28.54; only 50.0 crosses it
    val a = ((1 to 21).map(_.toDouble) :+ 50.0).map(("a", _))
    // group b: majority-constant -> MAD = 0 -> any deviation flags
    val b = (Seq.fill(20)(10.0) :+ 1000.0).map(("b", _))
    val out = Extensions53.robustOutliers((a ++ b).toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 22 && out("a").getDouble(2) == 11.5)
    assert(out("a").getDouble(3) == 5.5 && out("a").getLong(4) == 1,
      s"median 11.5, MAD 5.5, one outlier: ${out("a")}")
    assert(out("b").getDouble(3) == 0.0 && out("b").getLong(4) == 1,
      s"MAD=0 branch: the single deviant flags: ${out("b")}")
  }

  test("x139 fixture: every group reports, fractions in [0,1], outliers < n") {
    val out = SparkEntry.queries("x139_robust_outliers")(spark, sf0001).collect()
    assert(out.length >= 2)
    out.foreach { r =>
      val (n, nOut, frac) = (r.getLong(1), r.getLong(4), r.getDouble(5))
      assert(nOut >= 0 && nOut < n && frac >= 0.0 && frac <= 1.0, s"$r")
    }
  }
}
