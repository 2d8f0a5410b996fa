package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions136

/** Batch-136 invariants: RRF matches hand-computed reciprocal sums
  * and rewards cross-system consensus; ARI/NMI hit their exact
  * endpoints on perfect and independent partitions; the placebo ATT
  * sits closer to zero than the real one on the fixture.
  */
class Extensions136Spec extends SparkSpec {

  test("rrfFusion: hand-computed, consensus outranks a single top rank") {
    import spark.implicits._
    // system A: d1@1, d2@2; system B: d2@1, d3@2. d2 appears in both.
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("q_id", "c_id", "rk")
    val b = Seq((0L, 2L, 1L), (0L, 3L, 2L)).toDF("q_id", "c_id", "rk")
    val got = Extensions136.rrfFusion(Seq(a, b), k0 = 60L, topK = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val r61 = (1000000L * 2 + 61) / (2 * 61) // halfup(1e6/61)
    val r62 = (1000000L * 2 + 62) / (2 * 62)
    assert(got(2L)._1 == r61 + r62, s"d2 fuses both systems: $got")
    assert(got(1L)._1 == r61 && got(3L)._1 == r62, s"singles: $got")
    assert(got(2L)._2 == 1L, s"consensus wins rank 1: $got")
  }

  test("clusterAgreement: perfect partition reads 1e6 on both metrics") {
    import spark.implicits._
    val perfect = Seq((1L, "a", 10L), (2L, "a", 11L), (3L, "b", 20L),
      (4L, "b", 21L)).toDF("id", "cl", "lb")
      .select(col("cl"), (col("lb") / 10).cast("long").as("lb"))
    val r = Extensions136.clusterAgreement(perfect, "cl", "lb").head
    assert(r.getLong(3) == 1000000L, s"ARI at the perfect endpoint: $r")
    assert(r.getLong(4) == 1000000L, s"NMI at the perfect endpoint: $r")
  }

  test("clusterAgreement: label-blind clustering scores near zero") {
    import spark.implicits._
    // clusters split each label evenly -> expected-agreement baseline
    val rows = for (l <- 0L to 1L; i <- 0L until 8L)
      yield (i % 2, l) // cluster alternates within each label
    val df = rows.toDF("cl", "lb")
    val r = Extensions136.clusterAgreement(df, "cl", "lb").head
    assert(math.abs(r.getLong(3)) < 100000L, s"ARI ~ 0 when independent: $r")
    assert(math.abs(r.getLong(4)) < 100000L, s"NMI ~ 0 when independent: $r")
  }

  test("x309 fixture: placebo ATT is no larger in magnitude than the real one") {
    val r = SparkEntry.queries("x309_placebo_refutation")(spark, sf0001).head
    assert(r.getLong(0) > 0L && r.getLong(2) > 0L)
    assert(math.abs(r.getLong(3)) <= math.abs(r.getLong(1)),
      s"placebo must not read a stronger effect than the real design: $r")
  }
}
