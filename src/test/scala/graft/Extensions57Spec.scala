package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions57

/** Batch-57 invariants: item-item cosine reproduces hand-computed
  * values and prefers exclusive co-purchase over raw popularity; HITS
  * concentrates authority on the node every hub points to and ties
  * structurally symmetric nodes exactly.
  */
class Extensions57Spec extends SparkSpec {

  test("x146 planted: hand-computed cosine; exclusive pairing beats the popular item") {
    import spark.implicits._
    // items: a in baskets {1,2,3,4}; b in {1,2}; c in {3,4}; d in {5,6}; e in {5,6}
    // cos(a,b) = 2/sqrt(4*2) = 0.7071 ; cos(d,e) = 2/sqrt(2*2) = 1.0
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "a"), (4L, "c"),
      (5L, "d"), (5L, "e"), (6L, "d"), (6L, "e"))
    val out = Extensions57.itemItemRecs(rows.toDF("b", "i"), "b", "i", topK = 2)
      .collect()
    val top = out.filter(_.getString(0) == "d").head
    assert(top.getString(1) == "e" && top.getDouble(3) == 1.0,
      s"exclusive pair scores 1.0: $top")
    val ab = out.filter(r => r.getString(0) == "a" && r.getString(1) == "b").head
    assert(ab.getDouble(3) == 0.7071 && ab.getLong(2) == 2L,
      s"cos(a,b) = 2/sqrt(8): $ab")
    // b's best neighbor is a (its only one), but with the SAME cosine as
    // b->a from a's side; ranking within b: only a and (via baskets 1,2) nothing else
    val bTop = out.filter(_.getString(0) == "b").map(_.getString(1)).toSeq
    assert(bTop.head == "a")
  }

  test("x147 planted: the part every customer buys is the top authority; symmetric customers tie") {
    import spark.implicits._
    // customers 1..3 all buy part 100; customers 1,2 also buy 200, 201
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L), (1L, 201L), (2L, 201L))
      .toDF("src", "dst")
    val out = Extensions57.hits(edges, "src", "dst").collect()
    val auth = out.filter(_.getString(0) == "authority")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val hub = out.filter(_.getString(0) == "hub")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(auth(100L) == 1000000L, s"universal part is the max authority: $auth")
    assert(auth(100L) > auth(200L) && auth(200L) == auth(201L),
      s"200/201 structurally symmetric: $auth")
    assert(hub(1L) == hub(2L) && hub(1L) == 1000000L && hub(3L) < hub(1L),
      s"broad buyers are the top hubs: $hub")
  }

  test("x146 fixture: top-3 per item, deterministic, cosine in (0,1]") {
    val out = SparkEntry.queries("x146_item_item")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 3)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0, s"$r")
    }
  }

  test("x147 fixture: scores bounded by the 1e6 normalizer, both sides present") {
    val out = SparkEntry.queries("x147_hits")(spark, sf0001).collect()
    val types = out.map(_.getString(0)).distinct.sorted
    assert(types.toSeq == Seq("authority", "hub"))
    assert(out.forall(r => r.getLong(2) > 0L && r.getLong(2) <= 1000000L))
    assert(out.exists(_.getLong(2) == 1000000L), "the max normalizes to 1e6")
  }
}
