package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: 3-rep min-time comparison of x02 formulations (noise-robust).
  * Run: sbt "Test/runMain graft.PerfProbe2 /root/testdata/sf0.1"
  */
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    docs.count()

    def shingles(text: org.apache.spark.sql.Column) = {
      val tk = split(lower(text), " ")
      array_distinct(
        when(size(tk) >= 5,
          transform(sequence(lit(0), size(tk) - 5), i => concat_ws(" ", slice(tk, i + 1, lit(5)))))
        .otherwise(array(concat_ws(" ", tk))))
    }
    def keyed(src: DataFrame): DataFrame =
      src.select(col("doc_id"), shingles(col("text")).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
        .select(col("doc_id"), col("n_sh"),
          conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("shk"))
    def pairjoin(sh: DataFrame): Long =
      sh.as("x").join(sh.as("y").hint("shuffle_hash"),
          col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)))
        .count()

    def best(name: String)(f: => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"min=${times.min}%6.2f  all=${times.map(t => f"$t%5.2f").mkString(",")}  $name")
    }

    best("A: plan-only (index built on both sides)") { pairjoin(keyed(docs)) }
    best("B: repartition(32) before shingle") { pairjoin(keyed(docs.repartition(32, col("doc_id")))) }
    best("C: checkpoint keyed index, join from blocks") {
      pairjoin(keyed(docs).localCheckpoint(true))
    }
    best("D: repartition + checkpoint") {
      pairjoin(keyed(docs.repartition(32, col("doc_id"))).localCheckpoint(true))
    }
    spark.stop()
  }
}
