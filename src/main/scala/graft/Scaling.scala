package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Deterministic scale-up synthesis: sf(N·factor) from sf(N) by SHARD
  * REPLICATION — `factor` replicas of every table with DISJOINT
  * keyspaces, so the scaled corpus behaves like `factor` independent
  * shards of the original: row volume and key cardinality grow by
  * `factor`, per-key densities, per-source shares, text length/Zipf
  * shape, and join fan-outs are preserved, and cross-replica operators
  * produce nothing (no synthetic near-dups, no cross-shard edges) — the
  * scaling a real corpus exhibits when traffic grows, which is exactly
  * what a per-query scaling EXPONENT should be measured against.
  *
  * Column rules (all deterministic, no RNG):
  *  - key/id columns: `v · factor + r` — injective per replica,
  *    foreign keys transform identically on both sides so every join
  *    relationship holds within each replica and never across.
  *  - free-text and name columns: every token gains a TWO-char replica
  *    prefix (`aa…`, `bb…`). Two chars, not one: the FastSS deletion-1
  *    blocker catches strings whose variants collide after ONE
  *    deletion, so single-char prefixes would make all `factor`
  *    replicas of every string mutual candidates (a 10× candidate
  *    inflation the real corpus would not have); two deletions apart,
  *    replicas are invisible to it. Within a replica, token
  *    co-occurrence, n-gram structure, and duplication are untouched.
  *  - `documents.n_chars` is recomputed from the transformed text so
  *    length-derived gates stay consistent.
  *  - enum-like columns (event_type, lang, source, flags, segments)
  *    keep their cardinality — group-by keys do not densify, matching
  *    the TPC-H convention that dimension enums are sf-invariant.
  *  - timestamps are left as-is: `factor`× rows per window is exactly
  *    what `factor`× traffic looks like.
  */
object ScaleUp {

  private val KeyCols = Set(
    "doc_id", "vec_id", "event_id", "user_id",
    "l_orderkey", "l_partkey", "l_suppkey",
    "o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey",
    "n_nationkey", "n_regionkey", "r_regionkey")

  private val TokenPrefixCols = Set("text", "p_name", "c_name", "s_name")

  def synthesize(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int = 10): Unit = {
    require(factor >= 1 && factor <= 26, "factor must fit one prefix letter")
    graft.model.Tables.names.foreach { t =>
      val df = graft.model.Tables.load(spark, baseDir, t)
      val reps = df.withColumn("__r", explode(sequence(lit(0), lit(factor - 1))))
      val outCols = df.schema.fields.map { f =>
        if (KeyCols.contains(f.name) &&
            (f.dataType == LongType || f.dataType == IntegerType))
          (col(f.name) * factor + col("__r")).cast(f.dataType).as(f.name)
        else if (TokenPrefixCols.contains(f.name))
          regexp_replace(col(f.name), lit("(\\S+)"),
            concat(expr("char(97 + __r)"), expr("char(97 + __r)"), lit("$1")))
            .as(f.name)
        else col(f.name)
      }.toSeq
      val shaped = reps.select(outCols: _*)
      val fixed =
        if (t == "documents") shaped.withColumn("n_chars",
          length(col("text")).cast(shaped.schema("n_chars").dataType))
        else shaped
      fixed.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, base, out, factor)
    println(s"""{"synthesized":"$out","from":"$base","factor":$factor}""")
    spark.stop()
  }
}

/** The 100×-question answered with DATA instead of plan-shape argument:
  * run the heaviest queries at sf0.1 AND at the [[ScaleUp]]-synthesized
  * sf1 (10× rows, disjoint shards) in ONE session, and record each
  * query's measured scaling EXPONENT `ln(t_sf1 / t_sf0.1) / ln(factor)`
  * in `scaling.json` — 1.0 is perfectly linear, anything well above its
  * documented complexity is a re-plan trigger. [[Bench]] embeds the
  * artifact as `sf1_scaling` so the per-round bench carries it.
  */
object ScalingAudit {

  /** Default worklist: the slowest queries of the round-10 clean bench
    * (bench_full.json, by min) — the ones whose 100 TB behavior the
    * audit must pin.
    */
  val DefaultQueries: Seq[String] = Seq(
    "x99_triangles", "x165_label_noise", "x265_data_valuation",
    "x89_edit_distance_join", "x276_kfold_cv", "x241_knn_eval",
    "x76_sigstore_dedup", "x96_pagerank", "x67_signature_dedup",
    "x147_hits", "x133_community_metrics", "x122_kcore",
    "x167_dedup_funnel", "x274_ipw_att", "x211_directed_pagerank")

  private def fmt(d: Double): String = BigDecimal(d)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  /** Least-squares slope of ln t over ln factor — the 3-point exponent
    * fit (two points cannot distinguish n·log n from n^1.2; the third
    * point + recorded loadavg make a "clean" label defensible —
    * round-11 verdict item 6).
    */
  private def lsSlope(pts: Seq[(Double, Double)]): Double = {
    val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
    val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
    val den = xs.map(x => (x - xm) * (x - xm)).sum
    num / math.max(1e-12, den)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    // midFactor > 1 adds a THIRD measured point (factor-midFactor
    // synthesis) per query and a least-squares exponent_fit over all
    // three, with the box loadavg recorded next to every measurement
    val midFactor = sys.env.getOrElse("SPARK_GRAFT_SCALING_MIDFACTOR", "0").toInt
    val midDir = sys.env.getOrElse("SPARK_GRAFT_SFMID_DIR", "target/sfmid")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPEATS", "1").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALING_FILE", "scaling.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$scaled/lineitem.parquet").exists()) {
      System.err.println(s"[scaling] synthesizing $scaled from $base x$factor")
      ScaleUp.synthesize(spark, base, scaled, factor)
    }
    if (midFactor > 1 && !new java.io.File(s"$midDir/lineitem.parquet").exists()) {
      System.err.println(s"[scaling] synthesizing $midDir from $base x$midFactor")
      ScaleUp.synthesize(spark, base, midDir, midFactor)
    }
    // warm up every read path, then time all points PER QUERY in the
    // SAME session (same JVM state, same cpus) so ratios cancel the
    // environment; loadavg is captured right after each measurement so
    // co-tenant pressure is visible per number, not per run
    try {
      spark.read.parquet(s"$base/lineitem.parquet").count()
      spark.read.parquet(s"$scaled/lineitem.parquet").count()
      if (midFactor > 1) spark.read.parquet(s"$midDir/lineitem.parquet").count()
    } catch { case _: Throwable => () }
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val rows = names.flatMap { n =>
      val only = Some(Set(n))
      def point(dir: String): Option[(Double, Double)] = {
        val t = Bench.timeQueries(spark, dir, repeats, only, failed)
          .map { case (k, v, _) => k -> v }.toMap
        t.get(n).map(v => (v.min, loadavg))
      }
      val res = for {
        (bm, lb) <- point(base)
        mid = if (midFactor > 1) point(midDir) else None
        (sm, ls) <- point(scaled)
      } yield {
        val exp = math.log(sm / math.max(1e-9, bm)) / math.log(factor.toDouble)
        val pts = Seq((1.0, bm)) ++ mid.map(m => (midFactor.toDouble, m._1)) ++
          Seq((factor.toDouble, sm))
        val fit = lsSlope(pts)
        val midPart = mid.map { case (mm, lm) =>
          s""","mid_sec":${fmt(mm)},"mid_factor":$midFactor,"loadavg_mid":${fmt(lm)}"""
        }.getOrElse("")
        val fitPart =
          if (mid.isDefined) s""","exponent_fit":${fmt(fit)}""" else ""
        System.err.println(s"[scaling] $n base=${fmt(bm)}" +
          mid.map(m => s" mid=${fmt(m._1)}").getOrElse("") +
          s" scaled=${fmt(sm)} exp=${fmt(exp)}" +
          (if (mid.isDefined) s" fit=${fmt(fit)}" else ""))
        s""""$n":{"base_sec":${fmt(bm)},"scaled_sec":${fmt(sm)},""" +
          s""""exponent":${fmt(exp)},"loadavg_base":${fmt(lb)},""" +
          s""""loadavg_scaled":${fmt(ls)}$midPart$fitPart}"""
      }
      if (res.isEmpty) System.err.println(s"[scaling] $n produced no timing")
      res
    }
    val errs = failed.map(n => s"\"$n\"").mkString("[", ",", "]")
    val json = s"""{"factor":$factor,"base":"$base","scaled":"$scaled",""" +
      s""""cpus":$cpus,"repeats":$repeats,"errors":$errs,""" +
      s""""queries":{${rows.mkString(",")}}}"""
    val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
