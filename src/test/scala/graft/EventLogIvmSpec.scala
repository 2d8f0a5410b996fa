package graft

import org.apache.spark.sql.functions._
import graft.log.EventLog

/** Incremental aggregate maintenance: the monoid-fold snapshot merge
  * must equal a full recompute after any batch sequence, touch only the
  * buckets the batch touches, and inherit the modulus guards of the
  * latest-wins merge (same plumbing, asserted once more through this
  * entry point).
  */
class EventLogIvmSpec extends SparkSpec {

  private val aggs = Seq(
    ("n", "v", "count"), ("total", "v", "sum"),
    ("lo", "v", "min"), ("hi", "v", "max"))

  private def batch(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "v")
  }

  private def fullRecompute(rows: Seq[(Long, Long)]) =
    batch(rows).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def snapshot(dir: String) =
    EventLog.readSnapshot(spark, dir).select("user_id", "n", "total", "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("three incremental merges == one full recompute (count/sum/min/max)") {
    val dir = java.nio.file.Files.createTempDirectory("ivm").toString + "/snap"
    val b1 = Seq((1L, 10L), (2L, 5L), (1L, -3L))
    val b2 = Seq((2L, 7L), (3L, 100L))
    val b3 = Seq((1L, 0L), (3L, -100L), (3L, 1L))
    EventLog.mergeAggregate(batch(b1), dir, "user_id", aggs, numBuckets = 4)
    EventLog.mergeAggregate(batch(b2), dir, "user_id", aggs, numBuckets = 4)
    val touched3 = EventLog.mergeAggregate(batch(b3), dir, "user_id", aggs,
      numBuckets = 4)
    assert(snapshot(dir) == fullRecompute(b1 ++ b2 ++ b3))
    assert(touched3 == Set(1, 3), "batch 3 touches only buckets 1 and 3")
  }

  test("untouched buckets are not rewritten (O(delta), not O(table))") {
    val dir = java.nio.file.Files.createTempDirectory("ivm2").toString + "/snap"
    EventLog.mergeAggregate(batch(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))),
      dir, "user_id", aggs, numBuckets = 4)
    import graft.ops.StoreManifest
    def filesOf(b: Int): Set[String] =
      StoreManifest.files(spark, dir)
        .filter(f => StoreManifest.partValueOf(f, "bucket").contains(b.toString))
        .toSet
    val before = (0 to 3).map(filesOf)
    val touched = EventLog.mergeAggregate(batch(Seq((5L, 9L))),
      dir, "user_id", aggs, numBuckets = 4)
    assert(touched == Set(1))
    // untouched buckets keep the EXACT same immutable files in the new
    // manifest version; the touched bucket's state moved to a new batch
    assert(filesOf(0) == before(0) && filesOf(2) == before(2) &&
      filesOf(3) == before(3), "buckets 0/2/3 must be byte-untouched")
    assert(filesOf(1) != before(1), "bucket 1 was rewritten")
    before(1).foreach { old =>
      assert(!filesOf(1).contains(old), "bucket 1's state must live in a fresh batch")
    }
  }

  test("guards carry over: modulus mismatch refused, unknown op refused") {
    val dir = java.nio.file.Files.createTempDirectory("ivm3").toString + "/snap"
    EventLog.mergeAggregate(batch(Seq((1L, 1L))), dir, "user_id", aggs,
      numBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      EventLog.mergeAggregate(batch(Seq((2L, 1L))), dir, "user_id", aggs,
        numBuckets = 16)
    }
    assert(e.getMessage.contains("numBuckets"))
    val e2 = intercept[IllegalArgumentException] {
      EventLog.mergeAggregate(batch(Seq((2L, 1L))), dir, "user_id",
        Seq(("x", "v", "avg")), numBuckets = 8)
    }
    assert(e2.getMessage.contains("avg"))
  }

  test("mergeAggregateOnce: redelivered batches never double-fold (exactly-once IVM)") {
    val dir = java.nio.file.Files.createTempDirectory("ivm5").toString + "/snap"
    val b1 = Seq((1L, 10L), (2L, 5L))
    val b2 = Seq((1L, 7L), (3L, 2L))
    // deliver batch 0 twice, batch 1 three times (at-least-once chaos)
    assert(EventLog.mergeAggregateOnce(batch(b1), dir, "user_id", aggs,
      batchId = 0L, numBuckets = 4).isDefined)
    assert(EventLog.mergeAggregateOnce(batch(b1), dir, "user_id", aggs,
      batchId = 0L, numBuckets = 4).isEmpty, "redelivery must be a no-op")
    assert(EventLog.mergeAggregateOnce(batch(b2), dir, "user_id", aggs,
      batchId = 1L, numBuckets = 4).isDefined)
    assert(EventLog.mergeAggregateOnce(batch(b2), dir, "user_id", aggs,
      batchId = 1L, numBuckets = 4).isEmpty)
    assert(EventLog.mergeAggregateOnce(batch(b2), dir, "user_id", aggs,
      batchId = 1L, numBuckets = 4).isEmpty)
    assert(snapshot(dir) == fullRecompute(b1 ++ b2),
      "n redeliveries must fold exactly once each")
  }

  test("an interleaved plain merge must not drop the last_batch watermark") {
    val dir = java.nio.file.Files.createTempDirectory("ivm7").toString + "/snap"
    val b1 = Seq((1L, 10L), (2L, 5L))
    val manual = Seq((4L, 100L))
    assert(EventLog.mergeAggregateOnce(batch(b1), dir, "user_id", aggs,
      batchId = 0L, numBuckets = 4).isDefined)
    // a plain (non-streaming) merge lands on the SAME snapshot — e.g. a
    // batch backfill between micro-batches. It must carry the pinned
    // meta forward: dropping last_batch here would re-enable the
    // double-fold on the next redelivery.
    EventLog.mergeAggregate(batch(manual), dir, "user_id", aggs, numBuckets = 4)
    assert(EventLog.mergeAggregateOnce(batch(b1), dir, "user_id", aggs,
      batchId = 0L, numBuckets = 4).isEmpty,
      "redelivery after an interleaved plain merge must STILL be a no-op")
    assert(snapshot(dir) == fullRecompute(b1 ++ manual),
      "batch 0 must fold exactly once despite the interleaved merge")
  }

  test("streaming aggregate snapshot end-to-end: sums survive double delivery") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivm6").toString + "/snap"
    val ckpt = java.nio.file.Files.createTempDirectory("ivm6ck").toString
    val stream = MemoryStream[(Long, Long)]
    // the foreachBatch body is invoked TWICE per micro-batch — a
    // simulated redelivery harsher than Structured Streaming's own
    val q = stream.toDS().toDF("user_id", "v").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        EventLog.mergeAggregateOnce(b, dir, "user_id", aggs, id, numBuckets = 4)
        EventLog.mergeAggregateOnce(b, dir, "user_id", aggs, id, numBuckets = 4)
        ()
      }
      .start()
    val b1 = Seq((1L, 10L), (2L, 5L)); val b2 = Seq((1L, -3L), (3L, 9L))
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(snapshot(dir) == fullRecompute(b1 ++ b2),
      "every micro-batch delivered twice must land exactly once")
  }

  test("latest-wins merge still green through the shared plumbing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm4").toString + "/snap"
    val t0 = new java.sql.Timestamp(1700000000000L)
    EventLog.mergeSnapshot(Seq(
      graft.model.Event(1L, "PlayerCreated", 1L, t0, """{"a":1}"""),
      graft.model.Event(2L, "PlayerCreated", 1L, t0, """{"b":1}""")).toDF(),
      dir, numBuckets = 4)
    EventLog.mergeSnapshot(Seq(
      graft.model.Event(1L, "PlayerUpdated", 2L, t0, """{"a":2}""")).toDF(),
      dir, numBuckets = 4)
    val got = EventLog.readSnapshot(spark, dir).select("id", "version")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }
}
