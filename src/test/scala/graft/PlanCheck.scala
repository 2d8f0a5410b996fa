package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: check exchange-reuse on the hashed-key shingle self-join. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.model.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    def shingles(text: org.apache.spark.sql.Column) = {
      val tk = split(lower(text), " ")
      array_distinct(
        when(size(tk) >= 5,
          transform(sequence(lit(0), size(tk) - 5), i => concat_ws(" ", slice(tk, i + 1, lit(5)))))
        .otherwise(array(concat_ws(" ", tk))))
    }
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      .select(col("doc_id"), col("n_sh"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("shk"))
    val j = sh.as("x").join(sh.as("y").hint("shuffle_hash"),
        col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1)).as("n"))
    println("AQE=" + spark.conf.get("spark.sql.adaptive.enabled"))
    println("EXCH_REUSE=" + spark.conf.get("spark.sql.exchange.reuse"))
    j.count() // force AQE final plan
    val plan = j.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + plan.contains("ReusedExchange"))
    println("SHUFFLED_HASH=" + plan.contains("ShuffledHashJoin"))
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
