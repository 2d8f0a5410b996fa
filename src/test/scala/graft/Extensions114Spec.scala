package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions114

/** Batch-114 invariants: CEM removes confounding a naive difference
  * cannot (planted Simpson reversal), prunes honestly; the typed top-k
  * fold is answer-identical to the window idiom and order-insensitive.
  */
class Extensions114Spec extends SparkSpec {

  /** Planted Simpson's paradox: within BOTH cells treatment adds +10
    * cents, but treated units concentrate in the low-outcome cell, so
    * the naive pooled difference is NEGATIVE.
    */
  private def simpson = {
    import spark.implicits._
    val rows =
      // cell A (base 100): 8 treated, 2 control
      (0 until 8).map(i => (i.toLong, 1L, 110L, "A")) ++
      (8 until 10).map(i => (i.toLong, 0L, 100L, "A")) ++
      // cell B (base 1000): 2 treated, 8 control
      (10 until 12).map(i => (i.toLong, 1L, 1010L, "B")) ++
      (12 until 20).map(i => (i.toLong, 0L, 1000L, "B"))
    rows.toDF("unit", "treated", "cents", "cell")
  }

  test("CEM recovers the within-cell effect under a Simpson reversal") {
    val naiveDiff = {
      val r = simpson.agg(
        (sum(when(col("treated") === 1, col("cents"))) /
          sum(when(col("treated") === 1, 1L)) -
         sum(when(col("treated") === 0, col("cents"))) /
          sum(when(col("treated") === 0, 1L))).as("d")).collect()(0).getDouble(0)
      r
    }
    assert(naiveDiff < 0, s"fixture must exhibit the reversal: $naiveDiff")
    val att = Extensions114.cemAtt(simpson, "treated", "cents", Seq("cell"))
      .collect()
    assert(att.length == 2, "both cells matched")
    val head = att.head
    assert(head.getAs[Long]("att_micro") == 10000000L,
      s"ATT = +10 cents exactly in micro: ${head}")
    assert(att.forall(_.getAs[Long]("cell_effect_micro") == 10000000L))
    assert(head.getAs[Long]("pruned_treated") == 0L
      && head.getAs[Long]("pruned_control") == 0L)
  }

  test("CEM prunes single-arm cells and reports the pruned mass") {
    import spark.implicits._
    val withOrphans = simpson.unionAll(
      Seq((90L, 1L, 7L, "T-only"), (91L, 0L, 7L, "C-only"))
        .toDF("unit", "treated", "cents", "cell"))
    val att = Extensions114.cemAtt(withOrphans, "treated", "cents", Seq("cell"))
      .collect()
    assert(att.length == 2, "orphan cells never become rows")
    assert(att.head.getAs[Long]("pruned_treated") == 1L
      && att.head.getAs[Long]("pruned_control") == 1L)
    assert(att.head.getAs[Long]("att_micro") == 10000000L,
      "pruned units do not perturb the matched estimate")
  }

  test("typed top-k fold == window rank, insensitive to input order") {
    import spark.implicits._
    val rows = Seq(
      (1L, 11L, 5L), (1L, 12L, 9L), (1L, 13L, 9L), (1L, 14L, 1L),
      (2L, 21L, 3L), (2L, 22L, 3L), (2L, 23L, 3L), (2L, 24L, 3L))
    val df = rows.toDF("g", "id", "score")
    val got = Extensions114.topKPerGroup(df, "g", "id", "score", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // ties break by id asc: g1 -> 12,13,11 ; g2 -> 21,22,23
    val want = Set(
      (1L, 12L, 9L, 1L), (1L, 13L, 9L, 2L), (1L, 11L, 5L, 3L),
      (2L, 21L, 3L, 1L), (2L, 22L, 3L, 2L), (2L, 23L, 3L, 3L))
    assert(got == want, s"got $got")
    val shuffled = rows.reverse.toDF("g", "id", "score")
      .repartition(7)
    val got2 = Extensions114.topKPerGroup(shuffled, "g", "id", "score", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got2 == want, "fold is order/partitioning-insensitive")
  }

  test("x260/x261 fixtures: sane shapes") {
    val cem = SparkEntry.queries("x260_cem_att")(spark, sf0001).collect()
    assert(cem.nonEmpty && cem.forall(r => r.getAs[Long]("n1") > 0
      && r.getAs[Long]("n0") > 0))
    assert(cem.map(_.getAs[Long]("att_micro")).distinct.length == 1)
    val tk = SparkEntry.queries("x261_topk_agg")(spark, sf0001).collect()
    assert(tk.length == 30, "10 suppliers x top-3")
    assert(tk.forall(_.getLong(3) <= 3L))
  }
}
