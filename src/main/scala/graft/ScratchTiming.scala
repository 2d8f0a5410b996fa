package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.{Extensions20, Extensions26}

/** Throwaway measurement main for the r14 optimization round (not part
  * of the driver contract): stage-by-stage cost of the x94-family
  * featurization path at the bench's sf/cpus.
  */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    if (args.headOption.contains("dedup")) { dedupProbe(spark, sfDir); spark.stop(); return }

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs scan only")(noop(docs.select(col("doc_id"), col("text"))))
    time("split+lower only")(noop(docs.select(col("doc_id"),
      split(lower(col("text")), " ").as("tk"))))
    val card = Extensions20.gopherRuleCard(docs, "doc_id", "text",
      carryCols = Seq("text"))
    time("gopherRuleCard (warm1)")(noop(card))
    time("gopherRuleCard (2nd)")(noop(card))
    val labeled = card.select(col("doc_id"), col("text"), col("keep"))
    val hf = Extensions26.hashedFeatures(labeled, "doc_id", "text", "keep")
    time("gopher+hashedFeatures")(noop(hf))
    time("gopher+hashedFeatures (2nd)")(noop(hf))
    val feat = time("materialize feat (checkpoint)")(hf.localCheckpoint(eager = true))
    time("feat count")(feat.count())
    time("trainLogreg 8 iters")(Extensions26.trainLogreg(feat))
    time("trainLogreg 8 iters (2nd)")(Extensions26.trainLogreg(feat))
    val n = feat.count()
    println(s"[scratch] feat rows: $n")
    val grp = pmod(col("doc_id"), lit(5L))
    time("multi x6 fused 8 iters") {
      Extensions26.trainLogregMultiTrace(feat,
        (0 until 6).map(g => Extensions26.LogregSpec(
          Some(grp =!= (g % 5).toLong), col("y"))))
    }
    time("multi x6 fused 8 iters (2nd)") {
      Extensions26.trainLogregMultiTrace(feat,
        (0 until 6).map(g => Extensions26.LogregSpec(
          Some(grp =!= (g % 5).toLong), col("y"))))
    }
    time("6 separate trainings") {
      (0 until 6).foreach(g => Extensions26.trainLogreg(
        feat.filter(grp =!= (g % 5).toLong)))
    }
    println(s"[scratch] feat partitions: ${feat.rdd.getNumPartitions}")
    (1 to 3).foreach(i => time(s"range(1e6).sum #$i")(
      spark.range(1000000L).selectExpr("sum(id)").collect()))
    (1 to 3).foreach(i => time(s"feat count #$i")(feat.count()))
    (1 to 3).foreach(i => time(s"feat sum(y) agg #$i")(
      feat.agg(sum(col("y"))).collect()))
    val w0 = Array.fill(Extensions26.NumBuckets + 1)(7L)
    (1 to 3).foreach { i =>
      time(s"fixed-weight 6-model gradient job #$i") {
        Extensions26.trainLogregMultiTrace(feat,
          (0 until 6).map(g => Extensions26.LogregSpec(
            Some(grp =!= (g % 5).toLong), col("y"))), iters = 1)
      }
    }
    spark.stop()
  }

  /** Stage-level probe of the x89/x332 dedup-tier hot spots. */
  private def dedupProbe(spark: SparkSession, sfDir: String): Unit = {
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // ---- x89 (with r14 barrier) -------------------------------------
    val candM = time("x89 candidates materialize")(
      graft.ops.Extensions24.deletion1Candidates(
        Tables.load(spark, sfDir, "customer"), "c_name")
        .localCheckpoint(eager = true))
    time("x89 lev+filter over checkpoint")(noop(
      candM.withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 1)))
    time("x89 lev+filter+sort over checkpoint")(noop(
      candM.withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 1)
        .orderBy(col("name_a"), col("name_b"))))
    // ---- x89 -------------------------------------------------------
    val cust = Tables.load(spark, sfDir, "customer")
    time("x89 warm (full)")(noop(
      graft.ops.Extensions24.x89EditDistanceJoin(spark, sfDir)))
    val base = cust.select(col("c_name").as("s"))
      .filter(col("s").isNotNull).distinct()
    val keyed = base.select(col("s"), explode(array_union(
      array(col("s")),
      transform(sequence(lit(1), length(col("s"))), i =>
        concat(col("s").substr(lit(1), i - 1),
          col("s").substr(i + 1, length(col("s")) - i))))).as("kstr"))
      .select(col("s"), xxhash64(col("kstr")).as("k"))
    time("x89 keyed rows (explode neighborhoods)")(noop(keyed))
    val cand = graft.ops.Extensions24.deletion1Candidates(cust, "c_name")
    time("x89 candidates (join+distinct)")(noop(cand))
    println(s"[scratch] x89 candidate count: ${cand.count()}")
    time("x89 full (2nd)")(noop(
      graft.ops.Extensions24.x89EditDistanceJoin(spark, sfDir)))
    // ---- x332 ------------------------------------------------------
    time("x332 warm (full)")(noop(
      graft.ops.Extensions146.x332WeightedJaccard(spark, sfDir)))
    val docs = Tables.load(spark, sfDir, "documents")
    val tf0 = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(filter(split(lower(col("text")), " "),
          t => length(t) > 0)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    time("x332 tf agg")(noop(tf0))
    val sh0 = docs.select(col("doc_id").cast("long").as("doc_id"),
        filter(split(lower(col("text")), " "), t => length(t) > 0).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("tk")) - 2),
          i => concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1), element_at(col("tk"), i + 2))))
        .as("g"))
      .distinct()
    time("x332 shingles+distinct")(noop(sh0))
    println(s"[scratch] x332 shingle rows: ${sh0.count()}")
    time("x332 full (2nd)")(noop(
      graft.ops.Extensions146.x332WeightedJaccard(spark, sfDir)))
    // ---- x99 -------------------------------------------------------
    time("x99 warm (full)")(noop(
      graft.ops.Extensions29.x99Triangles(spark, sfDir)))
    val cs = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct()
    time("x99 cs distinct")(noop(cs))
    val shared = cs.as("x").join(cs.as("y"),
        col("x.c") === col("y.c") && col("x.sp") < col("y.sp"))
      .groupBy(col("x.sp").as("s1"), col("y.sp").as("s2"))
      .agg(count(lit(1)).as("shared"))
    time("x99 shared pairs agg")(noop(shared))
    println(s"[scratch] x99 shared rows: ${shared.count()}")
    val tot = shared.agg(count(lit(1)).as("np"), sum(col("shared")).as("ts"))
    val backbone = shared.crossJoin(broadcast(tot))
      .filter(col("shared") * col("np") > col("ts"))
      .select(col("s1"), col("s2"))
    println(s"[scratch] x99 backbone edges: ${backbone.count()}")
    time("x99 triangleCounts on backbone")(noop(
      graft.ops.Extensions29.triangleCounts(backbone, "s1", "s2")))
    time("x99 full (2nd)")(noop(
      graft.ops.Extensions29.x99Triangles(spark, sfDir)))
  }
}
