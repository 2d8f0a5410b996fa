package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions118

/** Batch-118 invariants: Theil–Sen shrugs off the outlier that moves an
  * OLS fit, exact values on a clean line; Mann–Kendall's S and
  * tie-corrected variance are exact, z saturates on a monotone series
  * and vanishes on a flat one.
  */
class Extensions118Spec extends SparkSpec {

  test("Theil-Sen: exact slope on a clean line, robust to one wild outlier") {
    import spark.implicits._
    val clean = (1 to 20).map(t => (t.toLong, 100L + 7L * t)).toDF("t", "y")
    val fit = Extensions118.theilSen(clean, "t", "y").collect()(0)
    assert(fit.getAs[Long]("slope_micro") == 7000000L, s"slope 7: $fit")
    assert(fit.getAs[Long]("n_pairs") == 190L)
    // one wild point (OLS slope would jump ~3x); TS median is unmoved
    val dirty = ((1 to 20).map(t => (t.toLong, 100L + 7L * t)) :+
      (21L, 1000000L)).toDF("t", "y")
    val fit2 = Extensions118.theilSen(dirty, "t", "y").collect()(0)
    assert(fit2.getAs[Long]("slope_micro") == 7000000L,
      s"29.3% breakdown point: $fit2")
  }

  test("Mann-Kendall: exact S/var18 with ties, z sign and saturation") {
    import spark.implicits._
    val up = (1 to 15).map(t => (t.toLong, t.toLong)).toDF("t", "y")
    val mk = Extensions118.mannKendall(up, "t", "y").collect()(0)
    assert(mk.getAs[Long]("s_stat") == 105L, "all 105 pairs ascend")
    assert(mk.getAs[Long]("var18") == 15L * 14 * 35, "no ties")
    assert(mk.getAs[Double]("z") > 5.0, s"strongly significant: $mk")
    // flat series: every pair ties -> S = 0, z = 0; variance fully
    // tie-corrected to 0 (one group of n ties cancels n(n-1)(2n+5))
    val flat = (1 to 10).map(t => (t.toLong, 42L)).toDF("t", "y")
    val mkF = Extensions118.mannKendall(flat, "t", "y").collect()(0)
    assert(mkF.getAs[Long]("s_stat") == 0L && mkF.getAs[Long]("var18") == 0L)
    // descending: symmetric negative
    val down = (1 to 15).map(t => (t.toLong, -t.toLong)).toDF("t", "y")
    val mkD = Extensions118.mannKendall(down, "t", "y").collect()(0)
    assert(mkD.getAs[Long]("s_stat") == -105L && mkD.getAs[Double]("z") < -5.0)
  }

  test("x266/x267 fixtures: one-row cards, consistent pairing") {
    val ts = SparkEntry.queries("x266_theil_sen")(spark, sf0001).collect()
    val mk = SparkEntry.queries("x267_mann_kendall")(spark, sf0001).collect()
    assert(ts.length == 1 && mk.length == 1)
    assert(ts(0).getAs[Long]("n_points") == mk(0).getAs[Long]("n_points"),
      "both fits read the same series")
  }
}
