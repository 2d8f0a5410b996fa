package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions76

/** Batch-76 invariants: an injected token tops the vocabulary movers
  * and reads the exact planted shares; the join profile counts
  * orphans in both directions (NULLs included) and reads zero on a
  * clean pair.
  */
class Extensions76Spec extends SparkSpec {

  test("x184 planted: an injected token tops the movers with the exact shares") {
    import spark.implicits._
    val mk = (1 to 20).map(i =>
      (i.toLong, (1 to 50).map(j => s"w$j").mkString(" ")))
    val prev = mk.toDF("doc_id", "text")
    val next = mk.map { case (i, t) =>
      (i, if (i <= 10) t + " injected injected injected injected injected" +
        " injected injected injected injected injected" else t)
    }.toDF("doc_id", "text")
    val out = Extensions76.vocabularyShift(prev, next, "text",
      topK = 5, minCount = 10L).collect()
    assert(out.head.getString(0) == "injected", s"${out.toSeq}")
    assert(out.head.getLong(1) == 0L && out.head.getLong(2) == 100L)
    assert(out.head.getDouble(3) == 0.0)
    assert(out.head.getDouble(5) > 3.0, "absent -> 100 occurrences is a big shift")
  }

  test("x185 planted: orphans both directions, NULL fks counted") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = Extensions76.joinIntegrityProfile(fact, "fk", dim, "pk")
      .collect().head
    assert(out.getLong(0) == 4 && out.getLong(1) == 2,
      s"orphan 9 + NULL: $out")
    assert(out.getDouble(2) == 0.5)
    assert(out.getLong(3) == 3 && out.getLong(4) == 2,
      s"dims 2 and 3 unreferenced: $out")
    assert(out.getDouble(5) == 0.6667)
  }

  test("x185 planted: a clean pair reads zero everywhere") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 1L).toDF("fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val out = Extensions76.joinIntegrityProfile(fact, "fk", dim, "pk")
      .collect().head
    assert(out.getLong(1) == 0 && out.getLong(4) == 0)
    assert(out.getDouble(2) == 0.0 && out.getDouble(5) == 0.0)
  }

  test("x184/x185 fixtures: perturbed tops the shift; lineitem-part referentially clean") {
    val shift = SparkEntry.queries("x184_vocab_shift")(spark, sf0001)
      .collect()
    assert(shift.head.getString(0) == "perturbed",
      s"the planted release token tops: ${shift.head}")
    val prof = SparkEntry.queries("x185_join_profile")(spark, sf0001)
      .collect().head
    assert(prof.getLong(1) == 0L, "fixture lineitem has no orphan parts")
  }
}
