package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.IdempotentSink

/** The exactly-once append contract: redelivered batches are no-ops,
  * torn (uncommitted) writes are invisible to readers, and an
  * end-to-end stream whose every batch is delivered TWICE still lands
  * each row exactly once.
  */
class IdempotentSinkSpec extends SparkSpec {

  test("redelivery of a committed batch is a no-op") {
    import spark.implicits._
    val out = tmpDir("graft-idem")
    val first = IdempotentSink.writeBatch(out, 0L,
      Seq(1L, 2L, 3L).toDF("v"))
    assert(first, "first delivery commits")
    val again = IdempotentSink.writeBatch(out, 0L,
      Seq(1L, 2L, 3L).toDF("v"))
    assert(!again, "redelivery is skipped")
    assert(IdempotentSink.readCommitted(spark, out).count() == 3L)
  }

  test("a torn write (no marker) is invisible until its redelivery commits") {
    import spark.implicits._
    val out = tmpDir("graft-idem-torn")
    IdempotentSink.writeBatch(out, 0L, Seq(1L).toDF("v"))
    // simulate a crash AFTER the data write, BEFORE the marker: write
    // the batch dir directly
    Seq(7L, 8L).toDF("v").write.parquet(s"$out/batch=1")
    assert(IdempotentSink.readCommitted(spark, out)
      .as[Long].collect().toSet == Set(1L), "torn batch hidden")
    // redelivery of batch 1 overwrites the torn dir and commits it
    assert(IdempotentSink.writeBatch(out, 1L, Seq(7L, 8L).toDF("v")))
    assert(IdempotentSink.readCommitted(spark, out)
      .as[Long].collect().toSet == Set(1L, 7L, 8L))
  }

  test("end-to-end: every batch delivered twice, rows land exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val out = tmpDir("graft-idem-e2e")
    val ms = MemoryStream[Long]
    val q = ms.toDS().toDF("v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // at-least-once simulated: deliver every batch twice
        IdempotentSink.writeBatch(out, id, df)
        IdempotentSink.writeBatch(out, id, df)
        ()
      }
      .option("checkpointLocation", tmpDir("graft-idem-ckpt"))
      .start()
    ms.addData(1L to 100L: _*)
    q.processAllAvailable()
    ms.addData(101L to 200L: _*)
    q.processAllAvailable()
    q.stop()
    val got = IdempotentSink.readCommitted(spark, out).as[Long].collect()
    assert(got.length == 200 && got.toSet == (1L to 200L).toSet,
      s"exactly once: ${got.length}")
  }
}
