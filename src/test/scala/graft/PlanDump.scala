package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: executed-plan dump for any SparkEntry query by name.
  * Run: sbt "Test/runMain graft.PlanDump x20_contamination [sfDir] [--full]"
  * Default prints only the structural lines (joins/exchanges/scans/windows/
  * aggregates); --full prints the whole adaptive final plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: PlanDump <query_name> [sfDir] [--full]"))
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    val full = args.contains("--full")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = fn(spark, sfDir)
    df.collect() // drive THIS QueryExecution so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    if (full) println(plan)
    else println(plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
      l.contains("Window") || l.contains("HashAggregate") || l.contains("Sort")
    ).mkString("\n"))
    spark.stop()
  }
}
