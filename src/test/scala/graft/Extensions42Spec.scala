package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions42

/** Batch-42 invariants: the geometry table covers the signature
  * budget's factorizations, the S-curve behaves (wider bands catch
  * more; characteristic thresholds climb with rows-per-band), and a
  * planted pair set yields the hand-computed recall.
  */
class Extensions42Spec extends SparkSpec {

  test("x118 fixture: factorizations complete, recalls in [0,1] and monotone in bands, s_star monotone in rows") {
    val out = SparkEntry.queries("x118_lsh_plan")(spark, sf0001)
      .orderBy(col("bands").desc).collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32)))
    val recalls = out.map(_.getDouble(4))
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    recalls.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi >= lo, s"more bands must not catch less: ${recalls.toSeq}") }
    assert(recalls.head > 0.999, "32 one-row bands catch every >=0.3 pair")
    val sStars = out.map(_.getDouble(2))
    sStars.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo < hi, s"s* climbs with rows per band: ${sStars.toSeq}") }
    assert(out.map(_.getLong(3)).distinct.length == 1, "one shared pair mass")
  }

  test("x118 planted pairs: hand-computed expected recall for one geometry") {
    import spark.implicits._
    // two identical docs (jaccard 1.0) and two sharing exactly half
    // their shingles — recall over the pair mass is hand-checkable
    val t1 = "a b c d e f g h i j"                    // 6 shingles
    val t2 = "a b c d e f g h i j"                    // dup of t1
    val t3 = "a b c d e f q r s t u v"                // shares 2 of its 8
    val docsDf = Seq((1L, t1), (2L, t2), (3L, t3), (4L, "z y x w v u t s r q p o n m"))
      .toDF("doc_id", "text")
    val out = Extensions42.lshRecallPlanner(docsDf, "doc_id", "text",
        nPerms = 32, pairThreshold = 0.1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    // pair (1,2) j=1.0 always caught; pair (1,3)/(2,3) j=2/(6+8-2)=0.1667
    // for (b=8, r=4): catch = 1-(1-0.1667^4)^8 = 0.00615 -> micro 6154
    val expect = {
      val c12 = 1000000L
      val j = 0.1667
      val c13 = math.round((1.0 - math.pow(1.0 - math.pow(j, 4), 8)) * 1e6)
      BigDecimal((c12 + 2 * c13) / 3.0 / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(out((8, 4)) - expect) < 2e-4,
      s"hand-computed recall for (8,4): got ${out((8, 4))}, want $expect")
  }
}
