package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions129

/** x284/x285: the Holt recursion against a fully hand-computed
  * three-day series, and harmonic centrality on a planted path graph
  * with hand-derived pivot draw and distances.
  */
class Extensions129Spec extends SparkSpec {

  test("holtDampedForecast: hand-computed integer recursion on [10, 12, 11]") {
    import spark.implicits._
    val rows = (Seq.fill(10)("2024-01-01 05:00:00") ++
        Seq.fill(12)("2024-01-02 07:00:00") ++
        Seq.fill(11)("2024-01-03 09:00:00"))
      .toDF("s").select(to_timestamp(col("s")).as("evt"))
    val got = Extensions129.holtDampedForecast(rows, "evt", horizon = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // l1=10e6, b1=2e6; t2: l=11,840,000 b=1,804,000;
    // t3: l=12,970,880 b=1,574,328 (each step via sdiv — worked in the
    // operator's scaladoc formulas)
    assert(got(1)._2 == 12970880L && got(1)._3 == 1574328L,
      s"final level/trend drifted: $got")
    assert(got(1)._1 == 12970880L + 1416895L, s"h=1 forecast: $got")
    assert(got(2)._1 == 12970880L + 2692101L, s"h=2 forecast: $got")
  }

  test("harmonicCentrality: planted path graph, hand-derived pivots and distances") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    // md5 draw over "1".."5": md5("4")=a87f… < md5("1")=c4ca… < the rest,
    // so the 2-pivot sample is {4, 1}
    val got = Extensions129.harmonicCentrality(edges, "a", "b", nPivots = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1) == ((1L, 333333L)), s"node 1 (d=3 from pivot 4): $got")
    assert(got(2) == ((2L, 1500000L)), s"node 2 (d=2,1): $got")
    assert(got(3) == ((2L, 1500000L)), s"node 3 (d=1,2): $got")
    assert(got(4) == ((1L, 333333L)), s"node 4 (d=3 from pivot 1): $got")
    assert(got(5) == ((2L, 1250000L)), s"node 5 (d=1,4): $got")
  }
}
