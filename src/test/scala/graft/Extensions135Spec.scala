package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions135

/** Batch-135 invariants on hand-checkable graphs: Katz ranks the hub
  * of a star highest and is exactly 10^6 there; betweenness puts all
  * dependency on a path's interior node and zero on leaves;
  * the neighborhood function is monotone and flags the 90% hop.
  */
class Extensions135Spec extends SparkSpec {

  private def star = {
    import spark.implicits._
    // hub 0 connected to leaves 1..5
    (1L to 5L).map(i => (0L, i)).toDF("a", "b")
  }

  test("katzCentrality: star hub is the maximum at exactly 1e6, leaves tie") {
    val got = Extensions135.katzCentrality(star, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 1000000L, s"hub is the normalization anchor: $got")
    val leaves = (1L to 5L).map(got)
    assert(leaves.distinct.size == 1 && leaves.head < 1000000L,
      s"leaves tie below the hub: $got")
  }

  test("pivotBetweenness: path graph puts dependency on the interior only") {
    import spark.implicits._
    // path 1-2-3: from any pivot, only node 2 lies between others
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Extensions135.pivotBetweenness(path, "a", "b",
        nPivots = 3, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(2L), s"only the interior carries dependency: $got")
    // pivots 1 and 3 each see delta(2) = 1e6; pivot 2 contributes 0
    assert(got(2L) == 2000000L, s"two endpoint pivots x 1e6: $got")
  }

  test("neighborhoodFunction: monotone shares, exactly one effective-diameter flag") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rows = Extensions135.neighborhoodFunction(path, "a", "b",
        nPivots = 4, maxHops = 4)
      .collect()
    val shares = rows.map(_.getLong(2))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      s"cumulative share is monotone: ${shares.toSeq}")
    assert(shares.last == 1000000L, "everything reached at max hops")
    assert(rows.count(_.getBoolean(3)) == 1, "exactly one first-crossing flag")
  }

  test("x304/x305 fixtures run and order deterministically") {
    val katz = SparkEntry.queries("x304_katz")(spark, sf0001).collect()
    assert(katz.nonEmpty && katz.forall(_.getLong(2) <= 1000000L))
    val bc = SparkEntry.queries("x305_betweenness")(spark, sf0001).collect()
    assert(bc.nonEmpty && bc.forall(_.getLong(2) > 0L))
  }
}
