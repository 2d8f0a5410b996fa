package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions77

/** Batch-77 invariants: the version audit reads planted gaps and
  * redeliveries exactly (and stays silent on a clean stream); the hot
  * partition flag fires on a planted whale key and stays quiet on
  * uniform traffic.
  */
class Extensions77Spec extends SparkSpec {

  test("x186 planted: a gap and a redelivery read exactly; clean keys are silent") {
    import spark.implicits._
    val rows =
      // key 1: versions 1,2,4,5 (3 missing) + 5 again (dup)
      Seq((1L, 1L), (1L, 2L), (1L, 4L), (1L, 5L), (1L, 5L)) ++
      // key 2: clean 1..3
      Seq((2L, 1L), (2L, 2L), (2L, 3L))
    val out = Extensions77.versionGapAudit(rows.toDF("k", "v"), "k", "v")
      .collect()
    assert(out.length == 1, "clean key filtered")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 5 && r.getLong(2) == 4)
    assert(r.getLong(5) == 1L, s"version 3 missing: $r")
    assert(r.getLong(6) == 1L, s"one duplicated version: $r")
    val all = Extensions77.versionGapAudit(rows.toDF("k", "v"), "k", "v",
      includeClean = true).collect()
    assert(all.length == 2 && all.find(_.getLong(0) == 2L).get.getBoolean(7))
  }

  test("x187 planted: the whale key flags; uniform keys do not") {
    import spark.implicits._
    val rows = (1 to 50).map(_ => 99L) ++ (1L to 10L).flatMap(k => Seq(k, k))
    val out = Extensions77.hotPartitionReport(rows.toDF("k"), "k")
      .collect()
    val top = out.head
    assert(top.getLong(0) == 99L && top.getLong(1) == 50L)
    // share 50/70; mean share 1/11; 50*11 > 3*70 -> hot
    assert(top.getBoolean(4), s"whale flagged: $top")
    assert(out.tail.forall(!_.getBoolean(4)), "uniform tail quiet")
  }

  test("x186/x187 fixtures: every damaged user reports; organic traffic unflagged") {
    val audit = SparkEntry.queries("x186_version_audit")(spark, sf0001)
      .collect()
    assert(audit.length == 15, "all 15 users were damaged")
    audit.foreach { r =>
      assert(r.getLong(5) > 0L && r.getLong(6) > 0L && !r.getBoolean(7), s"$r")
    }
    val hot = SparkEntry.queries("x187_hot_partitions")(spark, sf0001)
      .collect()
    assert(hot.length == 15)
    assert(hot.forall(!_.getBoolean(4)), "organic fixture has no hot keys")
  }
}
