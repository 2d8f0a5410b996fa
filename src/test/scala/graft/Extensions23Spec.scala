package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions23, Extensions24}
import java.sql.Timestamp

/** Batch-23/24 invariants beyond the value-level oracles: planted
  * timelines for the funnel/cohort/path operators, blocked-vs-brute
  * equality for the similarity join, and the plan shapes each operator
  * claims (stacked windows share one exchange; RFM scoring is
  * window-free).
  */
class Extensions23Spec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def log(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.map { case (u, t, at, id) => (u, t, ts(at), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
  }

  // ---- x85 ordered funnel ----------------------------------------------------

  test("x85 planted timelines: strictness, windowing, and ordering all bite") {
    val events = log(
      // user 1: clean view -> click -> purchase inside the windows = 3
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 11:00:00", 2L),
      (1L, "purchase", "2024-01-01 12:00:00", 3L),
      // user 2: click BEFORE the first view never counts = 1
      (2L, "click", "2024-01-01 09:00:00", 4L),
      (2L, "view", "2024-01-01 10:00:00", 5L),
      // user 3: purchase outside the 24h window of the click = 2
      (3L, "view", "2024-01-01 10:00:00", 6L),
      (3L, "click", "2024-01-01 11:00:00", 7L),
      (3L, "purchase", "2024-01-03 11:00:01", 8L),
      // user 4: no view at all = 0
      (4L, "purchase", "2024-01-01 10:00:00", 9L),
      // user 5: second, in-window click rescues the funnel = 3
      (5L, "view", "2024-01-01 10:00:00", 10L),
      (5L, "click", "2024-01-01 09:00:00", 11L),
      (5L, "click", "2024-01-01 12:00:00", 12L),
      (5L, "purchase", "2024-01-01 13:00:00", 13L))
    val out = Extensions23.orderedFunnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), stepWindowUs = 24L * 3600 * 1000000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 3L))
  }

  test("x85 plan: the chained step windows share ONE exchange on the user key") {
    val df = SparkEntry.queries("x85_ordered_funnel")(spark, sf0001)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    val wIdx = lines.zipWithIndex.filter(_._1.contains("Window")).map(_._2)
    assert(wIdx.size >= 3, s"expected one Window per funnel step:\n${lines.mkString("\n")}")
    val between = lines.slice(wIdx.min, wIdx.max)
    assert(!between.exists(_.contains("Exchange")),
      s"step windows must stack on one user-key exchange:\n${lines.mkString("\n")}")
  }

  // ---- x86 cohort retention --------------------------------------------------

  test("x86 planted cohorts: day-0 row counts the whole cohort, offsets are exact") {
    val events = log(
      (1L, "purchase", "2024-01-01 10:00:00", 1L),
      (2L, "purchase", "2024-01-01 11:00:00", 2L),
      (1L, "purchase", "2024-01-03 10:00:00", 3L), // u1 returns at offset 2
      (3L, "purchase", "2024-01-02 10:00:00", 4L),
      (3L, "purchase", "2024-01-02 23:00:00", 5L), // same-day activity dedups
      (1L, "view", "2024-01-05 10:00:00", 6L)) // non-conversion never counts
    val out = Extensions23.cohortRetention(events, "user_id", "event_type", "ts", "purchase")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L))
  }

  test("x86 fixture: every cohort has a day-0 row and offsets are non-negative") {
    val rows = SparkEntry.queries("x86_cohort_retention")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 0L))
    val byCohort = rows.groupBy(_.getDate(0).toString)
    assert(byCohort.values.forall(_.exists(_.getLong(1) == 0L)),
      "a user is active on their own cohort day by definition")
    // day-0 is the cohort's maximum: retention can never exceed it
    byCohort.values.foreach { rs =>
      val day0 = rs.find(_.getLong(1) == 0L).get.getLong(2)
      assert(rs.forall(_.getLong(2) <= day0))
    }
  }

  // ---- x87 Markov transitions ------------------------------------------------

  test("x87 rows normalize: per-from probabilities sum to 1 within rounding") {
    val rows = SparkEntry.queries("x87_markov_transitions")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-3 * rs.length, s"row sum $s")
    }
    // transition count conservation: n sums to (events - one per user)
    val e = spark.read.parquet(s"$sf0001/events.parquet")
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("x87 planted chain: deterministic timeline gives exact counts") {
    val events = log(
      (1L, "a", "2024-01-01 10:00:00", 1L),
      (1L, "b", "2024-01-01 10:01:00", 2L),
      (1L, "a", "2024-01-01 10:02:00", 3L),
      (1L, "b", "2024-01-01 10:03:00", 4L),
      (2L, "a", "2024-01-01 10:00:00", 5L),
      (2L, "c", "2024-01-01 10:01:00", 6L))
    val out = Extensions23.markovTransitions(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      ("a", "b") -> (2L, 0.6667), ("a", "c") -> (1L, 0.3333), ("b", "a") -> (1L, 1.0)))
  }

  // ---- x88 RFM ---------------------------------------------------------------

  test("x88 scores are terciles with recency inverted; segment concatenates them") {
    val rows = SparkEntry.queries("x88_rfm_segments")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(rs >= 1 && rs <= 3 && fs >= 1 && fs <= 3 && ms >= 1 && ms <= 3)
      assert(r.getString(7) == s"$rs$fs$ms")
    }
    // recency inversion: the most recent user scores >= the least recent one
    val byRec = rows.sortBy(_.getLong(1))
    assert(byRec.head.getLong(4) >= byRec.last.getLong(4))
  }

  test("x88 plan: scoring is window-free (broadcast bounds, never an ntile sort)") {
    val plan = SparkEntry.queries("x88_rfm_segments")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"RFM scoring must be map-side:\n$plan")
  }

  // ---- x89 deletion-neighborhood join -----------------------------------------

  test("x89 planted edits: substitution, insertion, deletion found; distance 2 is not") {
    import spark.implicits._
    val names = Seq("kitten", "sitten", "kittens", "itten", "sittin", "unrelated")
      .toDF("name")
    val pairs = Extensions24.editDistance1Pairs(names, "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("kitten", "sitten")), "substitution")
    assert(pairs.contains(("kitten", "kittens")), "insertion")
    assert(pairs.contains(("itten", "kitten")), "deletion")
    assert(pairs.contains(("itten", "sitten")))
    assert(!pairs.exists(p => p._1 == "unrelated" || p._2 == "unrelated"))
    assert(!pairs.contains(("kitten", "sittin")), "distance 2 must be rejected")
    assert(!pairs.contains(("sittin", "kitten")))
  }

  test("x89 blocked join equals the brute-force N^2 form on the customer fixture") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val blocked = Extensions24.editDistance1Pairs(c, "c_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val a = c.select(col("c_name").as("name_a"))
    val b = c.select(col("c_name").as("name_b"))
    val brute = a.crossJoin(b)
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked == brute, s"blocked=${blocked.size} brute=${brute.size}")
    assert(blocked.nonEmpty)
  }

  test("x89 plan: candidate generation is an equi-join, never a cartesian") {
    val plan = SparkEntry.queries("x89_edit_distance_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"deletion-key equi-join expected:\n$plan")
  }

  // ---- x90 session paths -----------------------------------------------------

  test("x90 planted sessions: paths are time-ordered and gap-delimited") {
    val events = log(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 10:05:00", 2L),
      (1L, "purchase", "2024-01-01 10:10:00", 3L),
      // 7h gap -> new session for the same user
      (1L, "view", "2024-01-01 17:30:00", 4L),
      (2L, "view", "2024-01-01 09:00:00", 5L),
      (2L, "click", "2024-01-01 09:01:00", 6L),
      (2L, "purchase", "2024-01-01 09:02:00", 7L))
    val out = Extensions24.topSessionPaths(events, "user_id", "event_type", "ts",
      "event_id", gapUs = 6L * 3600 * 1000000, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view->click->purchase" -> 2L, "view" -> 1L))
  }

  test("x90 is deterministic across runs and bounded by k") {
    val q = SparkEntry.queries("x90_session_paths")
    val r1 = q(spark, sf0001).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val r2 = q(spark, sf0001).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(r1 == r2)
    assert(r1.size <= 20 && r1.nonEmpty)
    // ranking is by count desc then path
    assert(r1.map(-_._2).zip(r1.map(_._1)).sorted == r1.map(r => (-r._2, r._1)))
  }
}
