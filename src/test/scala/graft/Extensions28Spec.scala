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
