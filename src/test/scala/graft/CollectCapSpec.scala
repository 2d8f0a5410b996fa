package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions112, Extensions117, Extensions121, Extensions136,
  Extensions137}

/** Round-13 driver-collect cap sweep: every site whose bound is an INPUT
  * property (not a geometry constant or a limit clause) must loud-refuse
  * past its cap instead of OOMing the driver — and the caps must not
  * change behavior on well-shaped input. One refusal test per
  * newly-guarded site, plus the ucb1Replay duplicate-key semantics fix.
  */
class CollectCapSpec extends SparkSpec {

  test("clusterAgreement: near-unique clustering loud-refuses, bounded pull") {
    import spark.implicits._
    val wide = spark.range(100001L)
      .select(col("id").as("cl"), lit(0L).as("lb"))
    val e = intercept[IllegalArgumentException] {
      Extensions136.clusterAgreement(wide, "cl", "lb")
    }
    assert(e.getMessage.contains("contingency exceeds"), e.getMessage)
  }

  test("clusterAgreement: cap does not perturb an in-bounds result") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 2L)).toDF("cl", "lb")
    val r = Extensions136.clusterAgreement(df, "cl", "lb").head
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 1000000L, s"$r")
  }

  test("ucb1Replay: duplicate (day, arm) rows sum instead of last-wins") {
    import spark.implicits._
    // pre-batched truth: 3 days x 1 arm would violate days >= arms only
    // with >1 arms, so use 2 arms x 4 days
    val batched = Seq(
      (1, "a", 10L), (1, "b", 2L), (2, "a", 4L), (2, "b", 6L),
      (3, "a", 8L), (3, "b", 1L), (4, "a", 3L), (4, "b", 9L))
      .toDF("d", "a", "r")
    // raw form: every reward split into two rows that must ADD
    val raw = Seq(
      (1, "a", 7L), (1, "a", 3L), (1, "b", 1L), (1, "b", 1L),
      (2, "a", 2L), (2, "a", 2L), (2, "b", 5L), (2, "b", 1L),
      (3, "a", 4L), (3, "a", 4L), (3, "b", 0L), (3, "b", 1L),
      (4, "a", 1L), (4, "a", 2L), (4, "b", 4L), (4, "b", 5L))
      .toDF("d", "a", "r")
    val want = Extensions137.ucb1Replay(batched, "d", "a", "r")
      .collect().map(_.toSeq).toSeq
    val got = Extensions137.ucb1Replay(raw, "d", "a", "r")
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"raw events must batch additively:\n$got\n$want")
  }

  test("ucb1Replay: days*arms over the cap refuses before any wide collect") {
    import spark.implicits._
    val wide = spark.range(100001L)
      .select(col("id").as("d"), lit("a").as("a"), lit(1L).as("r"))
    val e = intercept[IllegalArgumentException] {
      Extensions137.ucb1Replay(wide, "d", "a", "r")
    }
    assert(e.getMessage.contains("bounded-series cap"), e.getMessage)
  }

  test("fellegiSunterLinkage: non-binary agreement column loud-refuses") {
    import spark.implicits._
    val bad = Seq((0, 0), (1, 1), (2, 0), (3, 1)).toDF("g1", "g2")
    val e = intercept[IllegalArgumentException] {
      Extensions112.fellegiSunterLinkage(bad, Seq("g1", "g2"))
    }
    assert(e.getMessage.contains("must be 0/1"), e.getMessage)
  }

  test("temperatureMix: near-unique source column loud-refuses") {
    import spark.implicits._
    val wide = spark.range(100001L)
      .select(col("id").as("doc_id"), concat(lit("s"), col("id")).as("src"))
    val e = intercept[IllegalArgumentException] {
      Extensions121.temperatureMix(wide, "doc_id", "src", totalTarget = 10L)
    }
    assert(e.getMessage.contains("distinct sources"), e.getMessage)
  }

  test("dataValuation: near-unique group column refuses before training") {
    import spark.implicits._
    val wide = spark.range(1001L).select(col("id").as("doc_id"),
      concat(lit("t"), col("id")).as("text"),
      (col("id") % 2).as("label"), col("id").as("grp"))
    val e = intercept[IllegalArgumentException] {
      Extensions117.dataValuation(wide, "doc_id", "text", "label", "grp")
    }
    assert(e.getMessage.contains("distinct groups"), e.getMessage)
  }
}
