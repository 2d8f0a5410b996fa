package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** Optimization-round evidence dumper: for each named query, write
  * `<outDir>/<name>_<tag>.txt` holding the formatted physical plan of
  * the returned frame PLUS the measured job/stage count and wall time
  * of one noop-sink execution. The driver-loop operators (GD chains,
  * BFS rounds) hide their cost in the job sequence, not the final
  * frame's plan — the counts are the before/after evidence a plan
  * diff can't show.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    names.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass: JIT/codegen/IO cache so the counted pass measures the
      // query shape, not first-run noise (same discipline as Bench warmup)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[plandump] $name warm failed: ${e.getMessage}") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a beat
      Thread.sleep(500)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val body =
        s"""query: $name  tag: $tag  sf: $sfDir  cpus: $cpus
           |spark_jobs: ${jobs.get}  stages: ${stages.get}  wall_sec: ${f"${dt}%.3f"}
           |(jobs/stages cover plan+execution of ONE noop-sink run after a warm pass)
           |
           |$plan""".stripMargin
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), body)
      println(s"[plandump] $name $tag jobs=${jobs.get} stages=${stages.get} " +
        f"wall=${dt}%.3fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
