package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.model.Event
import graft.stream.Materializer

/** Dev drive of the CQRS streaming pipeline end to end, the way a user of
  * the library would wire it: spool dir (Kafka stand-in) → streaming fold →
  * durable parquet snapshot (the serving read model). Run:
  * sbt "Test/runMain graft.StreamDemo".
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    def pay(f: String, l: String) = s"""{"firstName":"$f","lastName":"$l"}"""
    val dir = java.nio.file.Files.createTempDirectory("streamdemo").toString
    val spool = s"$dir/spool"; val snap = s"$dir/snapshot"; val ckpt = s"$dir/ckpt"

    // command side: append events to the bus
    Seq(
      Event(1, "PlayerCreated", 0, ts(0), pay("Robert", "Brem")),
      Event(2, "PlayerCreated", 0, ts(1), pay("Other", "Player")),
      Event(1, "PlayerUpdated", 1, ts(2), pay("Robertupdated", "Bremupdated")),
      Event(2, "PlayerDeleted", 1, ts(3), "{}")
    ).toDS.write.mode("append").parquet(spool)

    // query side: replay-from-zero into a durable snapshot (ST3/ST4)
    val q = Materializer.startSnapshot(
      Materializer.readEventStream(spark, spool), snap, ckpt)
    q.awaitTermination()

    println("SNAPSHOT_AFTER_REPLAY:")
    Materializer.readSnapshot(spark, snap).orderBy("id").show(false)

    // a second command batch arrives; restart the stream (checkpoint resume)
    Seq(Event(3, "PlayerCreated", 0, ts(4), pay("New", "Joiner")))
      .toDS.write.mode("append").parquet(spool)
    val q2 = Materializer.startSnapshot(
      Materializer.readEventStream(spark, spool), snap, ckpt)
    q2.awaitTermination()

    println("SNAPSHOT_AFTER_SECOND_BATCH:")
    Materializer.readSnapshot(spark, snap).orderBy("id").show(false)
    spark.stop()
  }
}
