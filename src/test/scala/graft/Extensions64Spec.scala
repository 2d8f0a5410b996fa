package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions64

/** Batch-64 invariants: the runs test blows up on a sorted shard,
  * reads positive on a perfect alternation, and nulls a one-sided
  * shard; the MDE planner reproduces a hand-computed sigma/MDE.
  */
class Extensions64Spec extends SparkSpec {

  test("x160 planted: sorted order -> 2 runs, extreme negative z; alternation -> max runs") {
    import spark.implicits._
    // shard 0: keys stored in sorted order (ord = k): runs = 2
    val sorted = (1 to 40).map(k => (0L, k.toLong, k.toLong))
    // shard 1: alternating low/high: runs = n
    val alt = (1 to 40).map { i =>
      val k = if (i % 2 == 0) 100L + i else i.toLong
      (1L, i.toLong, k)
    }
    val out = Extensions64.runsTestAudit(
      (sorted ++ alt).toDF("shard", "ord", "k"), "shard", "ord", "k")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(4) == 2L, s"sorted -> 2 runs: ${out(0L)}")
    assert(out(0L).getDouble(5) < -5.0, "sorted order is wildly non-random")
    assert(out(1L).getLong(4) == 40L, s"alternation -> n runs: ${out(1L)}")
    assert(out(1L).getDouble(5) > 5.0, "perfect alternation over-disperses")
  }

  test("x160 planted: a one-sided shard (all equal) yields no testable rows") {
    import spark.implicits._
    val rows = (1 to 10).map(i => (0L, i.toLong, 7L))
    val out = Extensions64.runsTestAudit(rows.toDF("shard", "ord", "k"),
      "shard", "ord", "k").collect()
    assert(out.isEmpty, "every value equals the median -> all rows drop")
  }

  test("x161 planted: hand-computed sigma and MDE") {
    import spark.implicits._
    // 4 users; type 'm': values 10, 20 for users 1,2; users 3,4 absent -> 0
    // mean = 7.5, var = (100+400 - 900/4)/3 = 275/3 cents^2... in cents:
    // s1 = 3000, s2 = 1000000+4000000 = 5e6; mean_c = 750,
    // var_c = (5e6 - 9e6/4)/3 = (5e6-2.25e6)/3 = 916666.667
    val ev = Seq((1L, "m", 10.0), (2L, "m", 20.0),
      (3L, "other", 1.0), (4L, "other", 1.0))
      .toDF("user_id", "event_type", "value")
    val out = Extensions64.mdePlanner(ev, "user_id", "event_type", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    val m = out("m")
    assert(m.getLong(1) == 2L, "4 users -> 2 per arm")
    assert(m.getDouble(2) == 7.5, s"ITT mean over ALL users: $m")
    val sigma = math.sqrt((5e6 - 9e6 / 4) / 3) / 100.0
    assert(math.abs(m.getDouble(3) - sigma) < 1e-3, s"sigma ~ $sigma: $m")
    val mde = 2.801585 * math.sqrt((5e6 - 9e6 / 4) / 3 * 2.0 / 2) / 100.0
    assert(math.abs(m.getDouble(4) - mde) < 1e-3, s"mde ~ $mde: $m")
  }

  test("x160/x161 fixture: healthy hash shuffle |z| modest; MDE positive per type") {
    val runs = SparkEntry.queries("x160_runs_test")(spark, sf0001).collect()
    assert(runs.length == 4)
    runs.foreach { r =>
      assert(math.abs(r.getDouble(5)) < 4.0,
        s"md5 order should read as shuffled: $r")
    }
    val mde = SparkEntry.queries("x161_mde_planner")(spark, sf0001).collect()
    assert(mde.length >= 2)
    mde.foreach(r => assert(r.getDouble(4) > 0.0, s"$r"))
  }
}
