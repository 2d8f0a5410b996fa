package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the queries whose plan shape
  * carries the scale story. Run: sbt "Test/runMain graft.PlanAudit [name...]".
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q04_broadcast_join", "q32_latest_state",
        "x02_jaccard_pairs", "q21_topk")
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
