package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions115

/** Batch-115 invariants: binary segmentation finds a planted level
  * shift exactly, prefers the true break over off-by-one splits, and
  * ties break earliest.
  */
class Extensions115Spec extends SparkSpec {

  test("changepoint locates a planted level shift exactly") {
    import spark.implicits._
    // level 100 for t in 1..10, level 500 for t in 11..20
    val series = ((1 to 10).map(t => (t.toLong, 100L)) ++
      (11 to 20).map(t => (t.toLong, 500L))).toDF("t", "y")
    val got = Extensions115.changepoint(series, "t", "y").collect()(0)
    assert(got.getLong(0) == 10L, s"split after the last low point: $got")
    assert(got.getAs[Long]("n_left") == 10L && got.getAs[Long]("n_right") == 10L)
    assert(got.getAs[Long]("mean_left_micro") == 100000000L)
    assert(got.getAs[Long]("mean_right_micro") == 500000000L)
  }

  test("flat series: every split has zero gain, tie breaks earliest") {
    import spark.implicits._
    val flat = (1 to 8).map(t => (t.toLong, 42L)).toDF("t", "y")
    val got = Extensions115.changepoint(flat, "t", "y").collect()(0)
    assert(got.getAs[Long]("gain") == 0L)
    assert(got.getLong(0) == 1L, s"earliest-t tie rule: $got")
  }

  test("negative levels render sign-symmetric means") {
    import spark.implicits._
    val series = ((1 to 5).map(t => (t.toLong, -300L)) ++
      (6 to 10).map(t => (t.toLong, 300L))).toDF("t", "y")
    val got = Extensions115.changepoint(series, "t", "y").collect()(0)
    assert(got.getLong(0) == 5L)
    assert(got.getAs[Long]("mean_left_micro") == -300000000L)
    assert(got.getAs[Long]("mean_right_micro") == 300000000L)
  }

  test("x262 fixture: sane shape") {
    val r = SparkEntry.queries("x262_changepoint")(spark, sf0001).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_left") >= 1L && r(0).getAs[Long]("gain") >= 0L)
  }
}
