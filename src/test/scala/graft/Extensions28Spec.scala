package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions28

/** Batch-28 invariants beyond the value-level oracles: PageRank must
  * respect graph structure and conserve mass; CUPED must actually
  * reduce variance when the covariate carries signal.
  */
class Extensions28Spec extends SparkSpec {

  test("x96 planted star: the hub out-ranks every spoke; mass is conserved to rounding") {
    import spark.implicits._
    // star: hub 0 <-> spokes 1..20, plus a detached 2-cycle 100 <-> 101
    val spokes = (1L to 20L).flatMap(i => Seq((0L, i), (i, 0L)))
    val edges = (spokes ++ Seq((100L, 101L), (101L, 100L))).toDF("src", "dst")
    val ranks = Extensions28.pageRank(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(0L)
    (1L to 20L).foreach(i => assert(hub > ranks(i),
      s"hub must out-rank spoke $i: $hub vs ${ranks(i)}"))
    // the detached 2-cycle keeps exchanging its own mass + teleport
    assert(ranks(100L) == ranks(101L), "symmetric pair must tie exactly")
    // total mass stays ~1e6 micro (rounding loses O(1) micro per edge/node)
    val total = ranks.values.sum
    assert(math.abs(total - 1000000L) < 2000L,
      s"mass conservation within rounding: $total")
  }

  test("x96 determinism and repartitioning-independence") {
    import spark.implicits._
    val edges = (1L to 30L).flatMap(i => Seq((i, i % 7 + 50L), (i % 7 + 50L, i)))
      .toDF("src", "dst")
    val r1 = Extensions28.pageRank(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val r2 = Extensions28.pageRank(edges.repartition(13), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(r1 == r2, "integer PageRank is partitioning-independent")
  }

  /** Reference simulator mirroring pageRank's exact integer arithmetic
    * (half-away division, dangling redistribution, keep-base fallback) —
    * the sink-graph contract is asserted against it value-for-value.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    def ha(num: Long, den: Long): Long = (num * 2 + den) / (2 * den)
    val base = ha(150000L, n)
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> ha(1000000L, n)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      e.foreach { case (s0, d0) => contrib(d0) += ha(r(s0), deg(s0)) }
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val share = ha(dangling, n)
      r = nodes.map(nd => nd -> (base + ha(85L * (contrib(nd) + share), 100L))).toMap
    }
    r
  }

  test("x96 directed graph with sinks: no node vanishes, dangling mass is redistributed, values match the reference") {
    import spark.implicits._
    // a DAG: chain 1→2→3 plus 1→3 — node 3 is a sink, node 1 receives
    // nothing; the pre-fix operator dropped 1 after round 1 and leaked
    // 3's mass out of the system entirely
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = Extensions28.pageRank(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"all nodes must survive: ${got.keySet}")
    assert(got == refPageRank(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 8),
      s"sink-graph values must match the integer reference: $got")
    // sink 3 receives from both others; source 1 only keeps teleport+share
    assert(got(3L) > got(2L) && got(2L) > got(1L), s"rank order on the chain: $got")
    val total = got.values.sum
    assert(math.abs(total - 1000000L) < 2000L,
      s"mass conservation with sinks within rounding: $total")
  }

  test("x96 star-with-sink-spokes: matches reference; mass conserved") {
    import spark.implicits._
    // hub 0 points at 12 spokes, spokes point nowhere (all sinks)
    val e = (1L to 12L).map(i => (0L, i))
    val got = Extensions28.pageRank(e.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(e, 8))
    assert(math.abs(got.values.sum - 1000000L) < 2000L)
  }

  test("x96 salted iteration (hub mitigation) is value-identical to the plain join") {
    import spark.implicits._
    // planted hub: node 0 has 200 out-edges (the skewed src key), plus a tail
    val e = (1L to 200L).map(i => (0L, i)) ++ (1L to 40L).map(i => (i, (i % 5) + 300L))
    val plain = Extensions28.pageRank(e.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val salted = Extensions28.pageRank(e.toDF("src", "dst"), "src", "dst",
        saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(plain == salted, "salting must not change any rank")
    // the mitigation itself: the hot key's rows spread across salt buckets,
    // so the max per-(key,salt) group shrinks ~4x vs the unsalted single group
    val perSalt = e.toDF("src", "dst")
      .withColumn("__salt", pmod(hash(col("dst")), lit(4)))
      .groupBy(col("src"), col("__salt")).agg(count(lit(1)).as("n"))
      .filter(col("src") === 0L)
      .collect().map(_.getAs[Long]("n"))
    assert(perSalt.length == 4 && perSalt.max < 200L,
      s"hub rows must spread over salt buckets: ${perSalt.toSeq}")
  }

  test("x97 planted covariate: CUPED slashes variance when post tracks pre; theta recovers the slope") {
    import spark.implicits._
    // 60 users, two events each: pre value v_u, post value v_u + small
    // noise — the covariate explains almost all post variance
    val rows = (1L to 60L).flatMap { u =>
      val v = 10.0 + (u % 13) * 7.0
      Seq((u, "2024-01-05 00:00:00", v),
        (u, "2024-01-25 00:00:00", v + (u % 3) * 0.5))
    }.toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Extensions28.cupedReadout(rows, "user_id", "ts", "value",
      "2024-01-16 00:00:00").collect()
    assert(out.length == 2)
    out.foreach { r =>
      val (vPost, vAdj, theta) =
        (r.getAs[Double]("var_post"), r.getAs[Double]("var_adj"),
          r.getAs[Double]("theta"))
      assert(vAdj < vPost * 0.05,
        s"CUPED must remove ~all variance here: $vAdj vs $vPost")
      assert(math.abs(theta - 1.0) < 0.05, s"theta must recover slope 1: $theta")
    }
  }

  test("x97 fixture: arms partition the users and the readout is deterministic") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x97_cuped")(spark, d).collect()
    assert(out.length == 2)
    val n = out.map(_.getAs[Long]("n_users")).sum
    val users = spark.read.parquet(s"$d/events.parquet")
      .select("user_id").distinct().count()
    assert(n == users, s"arms must partition the $users users, got $n")
    val again = SparkEntry.queries("x97_cuped")(spark, d).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
