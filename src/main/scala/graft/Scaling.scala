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

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
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
    // warm up both read paths, then time base and scaled in the SAME
    // session (same JVM state, same cpus) so the ratio cancels the
    // environment
    try {
      spark.read.parquet(s"$base/lineitem.parquet").count()
      spark.read.parquet(s"$scaled/lineitem.parquet").count()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val only = Some(names.toSet)
    val tBase = Bench.timeQueries(spark, base, repeats, only, failed).toMap
    val tScaled = Bench.timeQueries(spark, scaled, repeats, only, failed).toMap
    val rows = names.filterNot(failed.contains).flatMap { n =>
      for { b <- tBase.get(n); s <- tScaled.get(n) } yield {
        val (bm, sm) = (b.min, s.min)
        val exp = math.log(sm / math.max(1e-9, bm)) / math.log(factor.toDouble)
        s""""$n":{"base_sec":${fmt(bm)},"scaled_sec":${fmt(sm)},"exponent":${fmt(exp)}}"""
      }
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
