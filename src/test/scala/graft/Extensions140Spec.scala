package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions140

/** Batch-140 invariants on hand-countable graphs: the butterfly card
  * matches K_{2,2}/K_{2,3} combinatorics from either enumeration
  * side; the k-truss keeps a clique and sheds a pendant triangle.
  */
class Extensions140Spec extends SparkSpec {

  test("butterflyCard: K23 has exactly C(3,2) butterflies, hand-counted caterpillars") {
    import spark.implicits._
    // K_{2,3}: lefts {1,2} x rights {10,20,30} — B = C(2,2)·C(3,2) = 3
    // caterpillars: per edge (du-1)(dv-1) = (3-1)(2-1) = 2, 6 edges -> 12
    val e = (for (u <- Seq(1L, 2L); v <- Seq(10L, 20L, 30L)) yield (u, v))
      .toDF("u", "v")
    val r = Extensions140.butterflyCard(e, "u", "v").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 6L)))
    assert(r.getLong(3) == 3L, s"K23 butterflies: $r")
    assert(r.getLong(4) == 12L, s"K23 caterpillars: $r")
    assert(r.getLong(5) == 1000000L, s"4B/P = 12/12 = 1: $r")
  }

  test("butterflyCard: enumeration side does not change the count") {
    import spark.implicits._
    // skew the degrees so the planner flips sides: one hub left vertex
    val e = ((1L to 20L).map(v => (1L, v)) ++ Seq((2L, 1L), (2L, 2L)))
      .toDF("u", "v")
    val r = Extensions140.butterflyCard(e, "u", "v").head
    // butterflies: pairs of rights shared by {1,2}: rights 1,2 -> C(2,2)=1
    assert(r.getLong(3) == 1L, s"one butterfly through rights 1,2: $r")
  }

  test("kTruss: keeps the 4-clique, sheds the pendant triangle's bridge") {
    import spark.implicits._
    // K4 on {1..4} (every edge in 2 triangles) + pendant triangle
    // {4,5,6} whose edges sit in exactly ONE triangle -> peeled at k=4
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val pendant = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val got = Extensions140.kTruss((k4 ++ pendant).toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == k4.toSet, s"only the clique survives: $got")
    assert(got.values.forall(_ == 2L), s"every K4 edge sits in 2 triangles: $got")
  }

  test("x318/x319 fixtures are non-degenerate at sf0.001") {
    val bc = SparkEntry.queries("x318_butterfly_card")(spark, sf0001).head
    assert(bc.getLong(3) > 0L && bc.getLong(4) > 0L && bc.getLong(5) > 0L)
    val kt = SparkEntry.queries("x319_ktruss")(spark, sf0001).collect()
    assert(kt.nonEmpty && kt.forall(_.getLong(2) >= 2L),
      s"4-truss edges carry support >= 2: ${kt.take(3).toSeq}")
  }
}
