package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions120

/** The blocking-family planner measures, then picks: its choice must
  * FLIP when the fixture's error geometry changes — the whole point of
  * measure-then-act over a hardcoded blocker.
  */
class BlockingPlanSpec extends SparkSpec {

  private def hex(i: Int): String =
    ("000000000000" + java.lang.Long.toHexString(i * 0x9E3779B97F4A7C15L))
      .takeRight(12)

  private def chosenOf(card: org.apache.spark.sql.DataFrame): (String, Map[String, Double]) = {
    val rows = card.collect()
      .map(r => (r.getString(0), r.getDouble(4), r.getBoolean(5)))
    (rows.find(_._3).get._1, rows.map(r => r._1 -> r._2).toMap)
  }

  test("suffix errors inside sort clusters: sorted-neighborhood wins, FastSS misses") {
    import spark.implicits._
    // each cluster key is 12 scrambled hex chars (neighboring clusters
    // share nothing), the planted dup differs by TWO trailing
    // substitutions — outside any deletion-1 neighborhood, inside the
    // 16-char sort prefix; single-token strings kill the prefix filter
    val recs = (0 until 80).flatMap { i =>
      val base = hex(i) + "tail"
      Seq(base + "ab", base + "qz")
    }.toDF("name")
    val (chosen, recall) = chosenOf(Extensions120.blockingPlan(recs, "name"))
    assert(chosen == "sorted_neighborhood", s"chose $chosen (recalls $recall)")
    assert(recall("sorted_neighborhood") >= 0.9 && recall("fastss_del1") < 0.5,
      s"fixture must separate the families: $recall")
  }

  test("leading-char errors scattered by the sort: FastSS wins, the window misses") {
    import spark.implicits._
    // the planted dup differs in the FIRST character (one substitution:
    // deletion-1 catches it) — which scatters the pair to opposite ends
    // of the sort order, so no realistic window reaches it
    val recs = (0 until 80).flatMap { i =>
      val base = hex(i) + "tailab"
      Seq("a" + base, "b" + base)
    }.toDF("name")
    val (chosen, recall) = chosenOf(Extensions120.blockingPlan(recs, "name"))
    assert(chosen == "fastss_del1", s"chose $chosen (recalls $recall)")
    assert(recall("fastss_del1") >= 0.9 && recall("sorted_neighborhood") < 0.5,
      s"fixture must separate the families: $recall")
  }

  test("the chosen family's candidates feed the FS scorer end-to-end") {
    import spark.implicits._
    // two-token variant of the cluster fixture (the SNM verify tail
    // needs shared word shingles to emit a pair at all)
    val recs = (0 until 80).flatMap { i =>
      val base = hex(i) + " tail"
      Seq(base + "ab", base + "qz")
    }.toDF("name")
    val card = Extensions120.blockingPlan(recs, "name")
    val (chosen, _) = chosenOf(card)
    assert(chosen == "sorted_neighborhood")
    // block with the chosen family (the x248 pair generator), derive
    // agreement fields, score with x255's Fellegi-Sunter EM — the
    // planner's output is a working input, not just a card
    val pairs = graft.ops.Extensions108.sortedNeighborhoodPairs(
        recs.withColumn("id", monotonically_increasing_id()),
        "id", "name", w = 10, threshold = 0.0, shingleSize = 1)
      .select(col("doc_a"), col("doc_b"))
    val named = recs.withColumn("id", monotonically_increasing_id())
    val ab = pairs
      .join(named.select(col("id").as("doc_a"), col("name").as("na")), Seq("doc_a"))
      .join(named.select(col("id").as("doc_b"), col("name").as("nb")), Seq("doc_b"))
      .select(
        (substring(col("na"), 1, 12) === substring(col("nb"), 1, 12)).as("key_agree"),
        // a hash-derived field keeps the pattern table non-separable —
        // a perfectly-separated fixture collapses an EM class to zero
        // mass (the x255 fixture lesson)
        (pmod(xxhash64(col("na"), col("nb")), lit(3L)) =!= 0L).as("tok_agree"))
    val fit = graft.ops.Extensions112.fellegiSunterLinkage(
      ab, Seq("key_agree", "tok_agree"), iters = 5)
    assert(fit.count() == 4, "the FS fit must produce the 2^k pattern table")
  }

  test("the all-pairs gold is guarded: over-cap input refuses loudly; the sampled mode prices a deterministic subset") {
    import spark.implicits._
    val recs = (0 until 500).flatMap { i =>
      val base = hex(i) + "tail"
      Seq(base + "ab", base + "qz")
    }.toDF("name")
    // a corpus above the cap must REFUSE — the n-squared gold pass on a
    // non-sample is the one quadratic scale-killer the engine bans
    val e = intercept[IllegalArgumentException] {
      Extensions120.blockingPlan(recs, "name", maxSample = 100L)
    }
    assert(e.getMessage.contains("ALL-PAIRS") &&
      e.getMessage.contains("blockingPlanSampled"),
      s"the refusal must name the sampled entry point: ${e.getMessage}")
    // the sampled entry point prices a deterministic md5 subset under the
    // cap — same call twice, bit-identical card
    val c1 = Extensions120.blockingPlanSampled(recs, "name", maxSample = 400L)
      .collect().map(_.toSeq).toSeq
    val c2 = Extensions120.blockingPlanSampled(recs, "name", maxSample = 400L)
      .collect().map(_.toSeq).toSeq
    assert(c1 == c2, "the md5 sample must replay bit-identically")
    assert(c1.nonEmpty && c1.exists(_.last == true))
    // under the cap the sampled mode IS the exact planner
    val small = recs.filter(col("name") < "2")
    assert(Extensions120.blockingPlanSampled(small, "name").collect().map(_.toSeq).toSeq ==
      Extensions120.blockingPlan(small, "name").collect().map(_.toSeq).toSeq)
  }
}
