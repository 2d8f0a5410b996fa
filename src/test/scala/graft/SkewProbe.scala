package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val boiler = "all rights reserved by megacorp"
    val corpus = (1 to 5000).map { i =>
      val tail = (1 to 10).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, if (i % 3 == 0) s"$boiler $tail" else tail)
    }.toDF("doc_id", "text")
    // SMJ variant (no hint)
    val sh = corpus.select(col("doc_id"),
        explode(expr("transform(sequence(0, size(split(text,' '))-5), i -> concat_ws(' ', slice(split(text,' '), i+1, 5)))")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("shk"))
    val smj = sh.as("x").join(sh.as("y").hint(args.headOption.getOrElse("merge")),
        col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id"), col("y.doc_id")).count()
    smj.collect()
    println("=== SMJ plan ===")
    val p = smj.queryExecution.executedPlan.toString
    println(p.linesIterator.filter(l => l.contains("AQEShuffleRead") || l.contains("Join")).mkString("\n"))
    println("skew=true present: " + p.contains("skew=true"))
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    val fin = smj.queryExecution.executedPlan.asInstanceOf[AdaptiveSparkPlanExec].executedPlan
    def stages(pl: SparkPlan): Seq[ShuffleQueryStageExec] = {
      val here = pl match { case st: ShuffleQueryStageExec => Seq(st); case _ => Nil }
      val kids = pl match {
        case q: QueryStageExec => stages(q.plan)
        case _ => pl.children.flatMap(stages)
      }
      here ++ kids
    }
    stages(fin).foreach { st =>
      st.mapStats.foreach { ms =>
        val sz = ms.bytesByPartitionId
        val sorted = sz.sorted
        println(s"shuffle stage ${st.id}: parts=${sz.length} max=${sorted.last} p50=${sorted(sz.length / 2)} nonzero=${sz.count(_ > 0)}")
      }
    }
    spark.stop()
  }
}
