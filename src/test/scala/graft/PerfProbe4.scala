package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Graft

/** Dev tool: wall-clock of the full round-4 curation pipeline at a given
  * SF — gate -> outliers -> score -> normalize -> select -> order ->
  * write shards. The number a user comparing engines actually feels.
  * Run: sbt "Test/runMain graft.PerfProbe4 /root/testdata/sf0.1"
  */
object PerfProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("pipebench").toString
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    docs.count() // warm

    val t0 = System.nanoTime()
    val tk = split(lower(col("text")), " ")
    val gates = Seq(
      "min_tokens" -> (size(tk) >= 5),
      "uniq_ratio" -> (size(array_distinct(tk)) * 10L >= size(tk) * 3L))
    val gated = docs.filter(gates.map(_._2).reduce(_ && _))
    val clean = Graft.robustOutliers(gated, "source", "n_chars")
      .filter(!col("is_outlier")).select(gated.columns.map(col): _*)
    val scored = Graft.qualityScore(clean, "doc_id", "text")
      .join(clean.select("doc_id", "source", "text"), Seq("doc_id"))
    val kept = Graft.quantileNormalize(scored, "source", "doc_id", "score")
      .filter(col("q_norm") >= 0.2)
    Graft.writeTrainingShards(kept, "doc_id", nShards = 32, s"$out/shards",
      Seq("text", "score", "q_norm"))
    val secs = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(s"$out/shards").count()
    println(f"PIPELINE $sfDir docs=${docs.count()} kept=$n wall=$secs%.2f s")
    spark.stop()
  }
}
