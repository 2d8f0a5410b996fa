package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev tool: total shuffle-write bytes of alternative operator shapes
  * (listener-accumulated across all stages of one action). Run:
  *   sbt "Test/runMain graft.ShuffleProbe /root/testdata/sf0.1"
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // at 100 TB neither index side broadcasts — force the shuffled join
      // the operator would actually run at scale, so key width is visible
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // report raw record width: lz4 hides the key-width difference on
      // this fixture (neighborhood strings share long prefixes), but the
      // sorter/comparator work and network of a real cluster see raw bytes
      .config("spark.shuffle.compress", sys.props.getOrElse("probe.compress", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics.shuffleWriteMetrics
        if (m.bytesWritten > 0)
          println(f"    stage ${sc.stageInfo.stageId}%3d [${sc.stageInfo.name.take(40)}%-40s] " +
            f"${m.bytesWritten / 1024.0}%10.1f KiB ${m.recordsWritten}%9d rec")
        bytes.addAndGet(m.bytesWritten)
        records.addAndGet(m.recordsWritten)
      }
    })

    def measure(name: String)(df: => DataFrame): Unit = {
      bytes.set(0L); records.set(0L)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  ${bytes.get() / 1024.0 / 1024.0}%9.2f MiB / ${records.get()}%d rec shuffled  $name")
    }

    val customer = graft.model.Tables.load(spark, sfDir, "customer")

    // string-keyed x89 (pre-round-6 shape): the (L-1)-char neighborhood
    // string is the join key
    def stringKeyed(rel: DataFrame, strCol: String): DataFrame = {
      val base = rel.select(col(strCol).as("s")).filter(col("s").isNotNull).distinct()
      val keyed = base.select(col("s"), explode(array_union(
        array(col("s")),
        transform(sequence(lit(1), length(col("s"))), i =>
          concat(col("s").substr(lit(1), i - 1),
            col("s").substr(i + 1, length(col("s")) - i))))).as("k"))
      keyed.select(col("s").as("name_a"), col("k"))
        .join(keyed.select(col("s").as("name_b"), col("k")), Seq("k"))
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"))
        .distinct()
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 1)
    }

    (1 to 2).foreach { round =>
      measure(s"x89 string-keyed (round $round)")(stringKeyed(customer, "c_name"))
      measure(s"x89 hash-keyed   (round $round)")(
        graft.ops.Extensions24.editDistance1Pairs(customer, "c_name"))
    }
    spark.stop()
  }
}
