package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: exact vs MinHash-sketch source overlap as source cardinality
  * grows — the measurement behind the "use the sketch past ~10^5 sources"
  * guidance (x45 vs x57).
  * Run: sbt "Test/runMain graft.PerfProbe3 /root/testdata/sf0.1"
  */
object PerfProbe3 {
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

    def best(label: String)(thunk: => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = thunk
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s ${times.map(_._1).min}%8.2fs  rows=${times.head._2}")
    }

    for (nSources <- Seq(20, 500, 2000)) {
      val relabeled = docs.withColumn("source",
        concat(lit("s"), pmod(col("doc_id"), lit(nSources.toLong))))
      best(s"exact   S=$nSources") {
        graft.ops.Extensions6.sourceOverlap(relabeled, "source", "text").count()
      }
      best(s"sketch  S=$nSources") {
        graft.ops.Extensions10.sourceOverlapSketch(relabeled, "source", "text").count()
      }
    }
    spark.stop()
  }
}
