package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries at any SF outside the
  * full bench loop — `Test/runMain graft.TimeQ <sfDir> <query>...`.
  * Used for per-query regression triage (the bench JSON names the slow
  * query; this reproduces it in isolation).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args.head).count()
      println(f"TIMING $q ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
