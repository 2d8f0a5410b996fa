package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions55
import graft.ops.Extensions55._

/** Batch-55 invariants: TextRank ranks the planted hub word on top and
  * gives symmetric words identical mass; the expectations audit counts
  * each planted violation class exactly and passes a clean table.
  */
class Extensions55Spec extends SparkSpec {

  test("x142 planted: the hub word outranks the spokes; symmetric spokes tie") {
    import spark.implicits._
    // "core" co-occurs with every spoke; spokes only with core
    val docs = Seq(
      (1L, "core alpha filler filler core beta"),
      (2L, "core gamma filler filler core delta"),
      (3L, "core alpha filler filler core gamma"))
      .toDF("doc_id", "text")
    val out = Extensions55.textRankKeywords(docs, "doc_id", "text",
      topK = 10, minLen = 4).collect()
    val rank = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.head.getString(0) == "core",
      s"hub word on top: ${out.toSeq}")
    assert(rank("core") > rank("alpha"))
    // alpha and gamma both touch core twice (positions differ, same
    // distinct undirected edge set) -> identical integer mass
    assert(rank("alpha") == rank("gamma"), s"symmetric spokes tie: $rank")
  }

  test("x142 fixture: top-30 cap, ordered, positive integer mass") {
    // the synthetic fixture vocabulary has ~24 tokens of length >= 4,
    // so the cap may not bind — assert the cap, not equality
    val out = SparkEntry.queries("x142_textrank")(spark, sf0001).collect()
    assert(out.length <= 30 && out.length >= 10)
    val ranks = out.map(_.getLong(1)).toSeq
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(ranks.forall(_ > 0L))
  }

  test("x143 planted: every check class counts its violations exactly") {
    import spark.implicits._
    val rel = Seq(
      (Some(1L), Some(10.0), Some("O")),   // clean
      (Some(1L), Some(10.0), Some("F")),   // dup id
      (None, Some(-5.0), Some("O")),       // null id + below range
      (Some(3L), None, Some("Z")),         // null range col + bad vocab
      (Some(99L), Some(20.0), None))       // FK miss + null vocab
      .toDF("id", "amount", "status")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val out = Extensions55.expectationsAudit(rel, Seq(
      ExpectNotNull("id"), ExpectUnique("id"),
      ExpectInRange("amount", 0.0, 100.0),
      ExpectAccepted("status", Seq("O", "F", "P")),
      ExpectForeignKey("id", dim, "k")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("not_null:id").getLong(2) == 1)
    assert(out("unique:id").getLong(2) == 1, "one extra row beyond distinct")
    assert(out("in_range:amount").getLong(2) == 2, "below-range + NULL")
    assert(out("accepted:status").getLong(2) == 2, "bad vocab + NULL")
    assert(out("foreign_key:id").getLong(2) == 1, "99 misses; NULL passes")
    assert(out.values.forall(r => r.getLong(1) == 5 && !r.getBoolean(3)))
  }

  test("x143 fixture: the orders contract is clean end to end") {
    val out = SparkEntry.queries("x143_expectations")(spark, sf0001).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getBoolean(3) && r.getLong(2) == 0L && r.getDouble(4) == 0.0,
        s"clean fixture: $r")
    }
  }
}
