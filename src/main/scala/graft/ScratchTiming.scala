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
}
