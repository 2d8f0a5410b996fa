package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-hub scaling audit for x325 (round-14, verdict task 3): the
  * conversion×touch fan-out of `attributionCard` is per-user quadratic
  * IN THE HUB (a bot with 10⁴ touches and 10² in-window conversions
  * owns 10⁶ candidate rows in ONE join key), so the synthetic-shard
  * audit ([[ScaleUp]]) cannot see it — replicas never share a user.
  * This audit PLANTS the hub: a deterministic event corpus of
  * `baseUsers` (× `factor`) normal users plus one fixed hub user, timed
  * with and without the hub at both sizes. The row it merges into
  * `scaling.json` answers two questions the verdict asked: does the
  * background still scale ~linearly with the hub present, and what
  * constant cost does the measured-then-allowed hub add (the
  * over-cap case loud-refuses — `AttributionSkewSpec` pins that).
  */
object AttributionHubAudit {

  /** Deterministic synthetic event table: `nUsers` normal users with
    * `perUser` events each (touches then one trailing conversion, all
    * inside one week) — plus, when `hubTouches > 0`, a single hub user
    * with `hubTouches` touches and `hubConvs` conversions, every touch
    * inside every conversion's 7-day lookback.
    */
  def events(spark: SparkSession, nUsers: Long, perUser: Int,
      hubTouches: Long, hubConvs: Long): DataFrame = {
    val base = to_timestamp(lit("2024-01-10 00:00:00"))
    val normals = spark.range(nUsers)
      .withColumn("k", explode(sequence(lit(0), lit(perUser - 1))))
      .select(
        concat(lit("n_"), col("id"), lit("_"), col("k")).as("event_id"),
        concat(lit("u"), col("id")).as("user_id"),
        when(col("k") === (perUser - 1), lit("purchase"))
          .when(pmod(col("k"), lit(2)) === 0, lit("click"))
          .otherwise(lit("view")).as("event_type"),
        (base + make_interval(lit(0), lit(0), lit(0), lit(0),
          col("k").cast("int"), lit(0), lit(0))).as("ts"))
    if (hubTouches <= 0) normals
    else {
      val hubT = spark.range(hubTouches).select(
        concat(lit("ht_"), col("id")).as("event_id"),
        lit("hub").as("user_id"), lit("click").as("event_type"),
        (base + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
          lit(0), col("id").cast("decimal(18,6)"))).as("ts"))
      val hubC = spark.range(hubConvs).select(
        concat(lit("hc_"), col("id")).as("event_id"),
        lit("hub").as("user_id"), lit("purchase").as("event_type"),
        (base + make_interval(lit(0), lit(0), lit(0), lit(2),
          lit(0), col("id").cast("int"), lit(0))).as("ts"))
      normals.unionAll(hubT).unionAll(hubC)
    }
  }

  private def fmt(d: Double): String = BigDecimal(d)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  def main(args: Array[String]): Unit = {
    val baseUsers = sys.env.getOrElse("SPARK_GRAFT_HUB_USERS", "30000").toLong
    val perUser = sys.env.getOrElse("SPARK_GRAFT_HUB_PER_USER", "8").toInt
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val hubTouches = sys.env.getOrElse("SPARK_GRAFT_HUB_TOUCHES", "10000").toLong
    val hubConvs = sys.env.getOrElse("SPARK_GRAFT_HUB_CONVS", "100").toLong
    val repeats = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPEATS", "1").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_HUB_FILE", "hub_audit.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scratch = graft.ops.Scratch.sessionDir(spark, "hubaudit")
    // materialize all four corpora once (generator cost out of the timing)
    val variants = Seq(
      ("base_hub", baseUsers, hubTouches),
      ("base_nohub", baseUsers, 0L),
      ("scaled_hub", baseUsers * factor, hubTouches),
      ("scaled_nohub", baseUsers * factor, 0L))
    variants.foreach { case (tag, n, ht) =>
      events(spark, n, perUser, ht, if (ht > 0) hubConvs else 0L)
        .write.mode("overwrite").parquet(s"$scratch/$tag")
    }
    def loadavg: Double = {
      val l = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      if (l.isNaN) -1.0 else l
    }
    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    def time(tag: String): (Double, Double) = {
      val df = spark.read.parquet(s"$scratch/$tag")
      val t = (1 to math.max(1, repeats)).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Extensions142.attributionCard(df, "user_id", "ts",
            "event_type", "purchase",
            maxUserCandidates = math.max(10000000L, hubTouches * hubConvs))
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        reset(); dt
      }.min
      (t, loadavg)
    }
    // untimed warm-up pass (codegen + parquet reader + the op's own
    // join/window paths) so the first timed variant doesn't pay JIT
    try {
      graft.ops.Extensions142.attributionCard(
          spark.read.parquet(s"$scratch/base_nohub"), "user_id", "ts",
          "event_type", "purchase")
        .write.format("noop").mode("overwrite").save()
      reset()
    } catch { case _: Throwable => () }
    val m = variants.map { case (tag, _, _) => tag -> time(tag) }.toMap
    val exp = math.log(m("scaled_hub")._1 / math.max(1e-9, m("base_hub")._1)) /
      math.log(factor.toDouble)
    val expNo = math.log(
      m("scaled_nohub")._1 / math.max(1e-9, m("base_nohub")._1)) /
      math.log(factor.toDouble)
    val fields = m.toSeq.sortBy(_._1).flatMap { case (tag, (t, l)) =>
      Seq(s""""${tag}_sec":${fmt(t)}""", s""""loadavg_$tag":${fmt(l)}""") }
    val json = s"""{"x325_attribution_hub":{${fields.mkString(",")},""" +
      s""""exponent_hub":${fmt(exp)},"exponent_nohub":${fmt(expNo)},""" +
      s""""hub_touches":$hubTouches,"hub_convs":$hubConvs,""" +
      s""""hub_candidates":${hubTouches * hubConvs},""" +
      s""""base_users":$baseUsers,"factor":$factor,"cpus":$cpus}}"""
    val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
