package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph tier's densification blind spot, closed with a real
  * fixture (round-11 verdict item 4): [[ScaleUp]]'s disjoint-shard
  * replication is exact for sharded growth but OPTIMISTIC for a single
  * connected graph that densifies as it grows — the round-11 synthesis
  * calibration measured x99's shard exponent at 0.21× the real-data
  * cost ratio. This generator builds a deterministic preferential-
  * attachment graph (Barabási–Albert 1999) whose hubs grow ~√V, so
  * wedge volume Σd² grows ~V·ln V and triangle/common-neighbor work
  * densifies the way a real social/purchase graph does; the audit then
  * measures each graph operator at V and factor·V and records a SECOND
  * exponent column (`densified`) next to the shard-replication one.
  *
  * Determinism: no RNG anywhere. Node i's j-th edge targets
  * ⌊u²·i⌋ where u = md5-lane(i, j)/2^60 — u² replays the BA index CDF
  * P(target ≤ k | time i) = √(k/i) (a node drawn proportionally to
  * degree at time i is, in expectation, the endpoint of a uniformly
  * random earlier edge; over the BA degree profile d_k ∝ √(i/k) that
  * CDF integrates to √(k/i)). Expected degree of node k ends at
  * ~m·√(V/k): a true heavy-tail hub profile, single giant component
  * (every node chains to the low-id core).
  */
object DensifiedGraph {

  /** Deterministic BA-like edge list: nodes 1..nNodes−1 each emit `m`
    * edges to strictly-lower ids (node 0 is the seed). Multi-edges can
    * arise (the ops' `.distinct()` normalizes, as with any raw edge
    * table); self-loops cannot (⌊u²·i⌋ < i for u < 1).
    */
  def edges(spark: SparkSession, nNodes: Long, m: Int = 4): DataFrame = {
    require(nNodes >= 2 && m >= 1)
    val u = graft.functions.HashFunctions.md5_bucket60(
      concat(col("src").cast("string"), lit(":"), col("j").cast("string"),
        lit(":pa"))).cast("double") / lit(1.152921504606847e18) // 2^60
    spark.range(1L, nNodes)
      .select(col("id").as("src"),
        explode(sequence(lit(0), lit(m - 1))).as("j"))
      .withColumn("dst", floor(u * u * col("src")).cast("long"))
      .select(col("src"), col("dst"))
  }

  /** md5-bucketed 50-community labels over the node set — input for
    * the communityMetrics probe (the label GEOMETRY is arbitrary; the
    * cost being measured is the edge-side join + per-community aggs).
    */
  def labels(nodes: DataFrame): DataFrame =
    nodes.select(col("node"),
      pmod(graft.functions.HashFunctions.md5_bucket60(
        concat(col("node").cast("string"), lit(":comm"))), lit(50L))
        .as("comm"))

  /** Bipartite PA mode (round-13): the SAME u² construction read as a
    * two-sided graph — left vertex i (its own partition, degree exactly
    * m) attaches to right vertex ⌊u²·i⌋, so right-side popularity ends
    * heavy-tailed at ~m·√(V/k) like a product/customer or doc/token
    * incidence. This is the geometry where butterfly counting's
    * Σ C(codegree,2) densifies by construction — exactly the motif ops'
    * shard-replication blind spot.
    */
  def bipartiteEdges(spark: SparkSession, nLeft: Long, m: Int = 4): DataFrame =
    edges(spark, nLeft, m)
      .select(col("src").as("u"), col("dst").as("v"))
}

/** Times each graph operator on [[DensifiedGraph]] at `baseNodes` and
  * `factor`·`baseNodes` in ONE session and writes per-op densified
  * exponents to `SPARK_GRAFT_DENSIFIED_FILE` (default densified.json)
  * — merged into scaling.json's `densified` key by the round tooling
  * so the bench artifact carries both columns. Ops are keyed by the
  * oracle query they back, so the two exponent columns line up.
  */
object DensifiedGraphAudit {

  private def fmt(d: Double): String = BigDecimal(d)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  /** The probes: each builds its result from a raw (src, dst) edge
    * relation exactly as the fixture-bound query does. kept in one
    * place so the worklist is auditable.
    */
  def probes: Seq[(String, DataFrame => DataFrame)] = Seq(
    "x96_pagerank" -> (e => graft.ops.Extensions28.pageRank(e, "src", "dst")),
    "x99_triangles" -> (e => graft.ops.Extensions29.triangleCounts(e, "src", "dst")),
    "x122_kcore" -> (e => graft.ops.Extensions45.kCore(e, "src", "dst")),
    "x132_assortativity" -> (e => graft.ops.Extensions50.assortativity(e, "src", "dst")),
    "x133_community_metrics" -> (e => graft.ops.Extensions50.communityMetrics(
      e, DensifiedGraph.labels(
        e.select(col("src").as("node")).unionAll(e.select(col("dst").as("node")))
          .distinct()),
      "src", "dst", "node", "comm")),
    "x147_hits" -> (e => graft.ops.Extensions57.hits(e, "src", "dst")),
    "x281_link_prediction" -> (e => graft.ops.Extensions128
      .linkPredictionScores(e, "src", "dst")),
    "x285_harmonic_centrality" -> (e => graft.ops.Extensions129
      .harmonicCentrality(e, "src", "dst")),
    "x304_katz" -> (e => graft.ops.Extensions135.katzCentrality(e, "src", "dst")),
    "x305_betweenness" -> (e => graft.ops.Extensions135
      .pivotBetweenness(e, "src", "dst")),
    "x306_neighborhood_fn" -> (e => graft.ops.Extensions135
      .neighborhoodFunction(e, "src", "dst")),
    // round-13 adds — the cohesion/motif ops the r12 verdict flagged as
    // shard-audited only. x318 reads the PA table bipartitely (left
    // degree m, right heavy-tailed — the side planner's real input);
    // x319 peels the unipartite form.
    "x318_butterflies" -> (e => graft.ops.Extensions140.butterflyCard(
      e, "src", "dst")),
    "x319_ktruss" -> (e => graft.ops.Extensions140.kTruss(e, "src", "dst")))

  // 3-point log-log least squares (round-13: the shard audit moved to
  // 3-point fits in round 12 because two points cannot separate n·log n
  // from n^1.2 — the densified section gets the same treatment)
  private def lsSlope(pts: Seq[(Double, Double)]): Double = {
    val l = pts.map { case (x, y) =>
      (math.log(x), math.log(math.max(1e-9, y))) }
    val n = l.size.toDouble
    val sx = l.map(_._1).sum; val sy = l.map(_._2).sum
    val sxx = l.map(p => p._1 * p._1).sum
    val sxy = l.map(p => p._1 * p._2).sum
    (n * sxy - sx * sy) / math.max(1e-12, n * sxx - sx * sx)
  }

  def main(args: Array[String]): Unit = {
    val baseNodes = sys.env.getOrElse("SPARK_GRAFT_DENSIFIED_NODES", "30000").toLong
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    require(factor > 1, "densified factor must exceed 1")
    // default mid point ~√factor so the three sizes are log-spaced; at
    // factor <= 3 there is no room for a distinct mid point, so the
    // audit degrades to a 2-point fit instead of refusing (ADVICE
    // round-14: a previously-valid SPARK_GRAFT_SCALE_FACTOR=2 run must
    // not break because round 13 added the mid size)
    val midFactor = sys.env.get("SPARK_GRAFT_DENSIFIED_MIDFACTOR")
      .map(_.toInt)
      .getOrElse(math.max(2, math.ceil(math.sqrt(factor.toDouble)).toInt))
    val threePoint = factor > 3 || (midFactor > 1 && midFactor < factor)
    if (threePoint)
      require(midFactor > 1 && midFactor < factor,
        "densified midFactor must sit strictly between 1 and the factor")
    val m = sys.env.getOrElse("SPARK_GRAFT_DENSIFIED_M", "4").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPEATS", "1").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_DENSIFIED_FILE", "densified.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = if (args.nonEmpty) Some(args.toSet) else None
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // materialize all three edge tables ONCE (parquet scratch) so
    // generator cost never pollutes the operator timing, and every size
    // reads the same physical format
    val scratch = graft.ops.Scratch.sessionDir(spark, "densified")
    val sizes =
      if (threePoint) Seq(
        ("base", 1.0, baseNodes),
        ("mid", midFactor.toDouble, baseNodes * midFactor),
        ("scaled", factor.toDouble, baseNodes * factor))
      else Seq(
        ("base", 1.0, baseNodes),
        ("scaled", factor.toDouble, baseNodes * factor))
    sizes.foreach { case (tag, _, n) =>
      DensifiedGraph.edges(spark, n, m)
        .write.mode("overwrite").parquet(s"$scratch/$tag")
    }
    val tables = sizes.map { case (tag, f, _) =>
      (tag, f, spark.read.parquet(s"$scratch/$tag")) }
    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    // NaN-guard like Bench: getSystemLoadAverage returns NaN/-1 on some
    // platforms and NaN is not valid JSON (ADVICE round-14)
    def loadavg: Double = {
      val l = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      if (l.isNaN) -1.0 else l
    }
    def time(df: => DataFrame): (Double, Double) = {
      val t = (1 to math.max(1, repeats)).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        reset(); dt
      }.min
      (t, loadavg)
    }
    val rows = probes.filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap { case (name, fn) =>
        try {
          val measured = tables.map { case (tag, f, e) =>
            val (t, l) = time(fn(e)); (tag, f, t, l) }
          val tb = measured.head._3
          val ts = measured.last._3
          val exp = math.log(ts / math.max(1e-9, tb)) / math.log(factor.toDouble)
          val fit = lsSlope(measured.map(p => (p._2, p._3)))
          System.err.println(s"[densified] $name " +
            measured.map(p => s"${p._1}=${fmt(p._3)}").mkString(" ") +
            s" exp=${fmt(exp)} fit=${fmt(fit)}")
          val fields = measured.flatMap { case (tag, _, t, l) =>
            Seq(s""""${tag}_sec":${fmt(t)}""", s""""loadavg_$tag":${fmt(l)}""")
          } ++ Seq(s""""exponent":${fmt(exp)}""",
            s""""exponent_fit":${fmt(fit)}""")
          Some(s""""$name":{${fields.mkString(",")}}""")
        } catch { case e: Throwable =>
          System.err.println(s"[densified] $name failed: ${e.getMessage}")
          None
        }
      }
    val json = s"""{"generator":"md5-seeded preferential attachment (u^2 index CDF)",""" +
      s""""base_nodes":$baseNodes,"factor":$factor,"mid_factor":$midFactor,""" +
      s""""m":$m,"cpus":$cpus,"repeats":$repeats,""" +
      s""""queries":{${rows.mkString(",")}}}"""
    val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
