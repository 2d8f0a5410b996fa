package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions101

/** Batch-101 invariants: the frontier is monotone non-increasing in
  * the threshold and prices planted copies exactly; the per-group fit
  * separates a clean lognormal group from a heavy-tailed one.
  */
class Extensions101Spec extends SparkSpec {

  test("x229 planted: exact copy drops at every threshold; near copy only at loose ones; frontier monotone") {
    import spark.implicits._
    val stem = "the quick brown fox jumps over the lazy dog while the slow red hen watches from the old wooden"
    val corpus = Seq(
      (1L, s"$stem fence"),
      (2L, s"$stem fence"),   // exact copy: jaccard 1.0 -> dropped everywhere
      (3L, s"$stem gate"),    // near copy: jaccard 0.5238 -> dropped at t <= 0.5
      (4L, "entirely different words that never shingle with the others at all"))
      .toDF("doc_id", "text")
    val out = Extensions101.dedupSavingsFrontier(corpus, "doc_id", "text",
        thresholds = Seq(0.3, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val b1 = (stem + " fence").length.toLong
    val b3 = (stem + " gate").length.toLong
    assert(out(0.3).getLong(1) == 2L &&
      out(0.3).getLong(3) == b1 + b3, s"loose drops both copies: ${out(0.3)}")
    assert(out(0.5).getLong(1) == 2L, s"0.5238 >= 0.5 still drops: ${out(0.5)}")
    assert(out(0.9).getLong(1) == 1L &&
      out(0.9).getLong(3) == b1, s"strict keeps the near copy: ${out(0.9)}")
    val drops = Seq(0.3, 0.5, 0.9).map(out(_).getLong(1))
    assert(drops == drops.sorted.reverse, s"monotone: $drops")
  }

  test("x230 planted: clean two-point group fits its moments; spiked group shows the tail") {
    import spark.implicits._
    val clean = (1 to 50).map(_ => ("a", 148L)) ++ (1 to 50).map(_ => ("a", 1097L))
    val heavy = (1 to 95).map(_ => ("b", 300L)) ++ (1 to 5).map(_ => ("b", 162755L))
    val df = (clean ++ heavy).toDF("g", "len")
    val out = Extensions101.groupedLengthFit(df, "g", "len")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("a").getDouble(2) - 6.0) < 0.01)
    assert(out("a").getLong(6) == 0L, s"clean group has no tail: ${out("a")}")
    assert(out("b").getLong(6) == 5L, s"spike counted exactly: ${out("b")}")
    assert(out("b").getDouble(7) == 0.05)
  }
}
