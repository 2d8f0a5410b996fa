package graft

import org.apache.spark.sql.functions._
import graft.ops.SketchStore

/** The sketch store's load-bearing algebra: appending batch sketches
  * and unioning at read time equals sketching everything in one pass —
  * including OVERLAPPING batches (register max is idempotent) — and the
  * estimate tracks exact distinct counts within HLL error.
  */
class SketchStoreSpec extends SparkSpec {

  private def events = graft.model.Tables.load(spark, sf0001, "events")

  test("union of appended batch sketches == one-pass sketch (disjoint + overlap)") {
    val store = tmpDir("graft-sketchstore")
    val first = events.filter(col("event_id") % 2 === 0)
    val second = events.filter(col("event_id") % 2 === 1)
    val overlap = events.filter(col("event_id") % 3 === 0) // re-adds seen users
    SketchStore.append(store, first, "event_type", "user_id")
    SketchStore.append(store, second, "event_type", "user_id")
    SketchStore.append(store, overlap, "event_type", "user_id")
    val served = SketchStore.estimate(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = SketchStore.sketchBatch(events, "event_type", "user_id")
      .select(col("g"), hll_sketch_estimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served == direct,
      s"batched registers must equal the one-pass registers: $served vs $direct")
  }

  test("estimates track exact distincts within HLL error") {
    val store = tmpDir("graft-sketchstore-acc")
    SketchStore.append(store, events, "event_type", "user_id")
    val est = SketchStore.estimate(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      val e = est(g).toDouble
      assert(math.abs(e - d) <= math.max(2.0, 0.05 * d),
        s"$g: estimate $e vs exact $d")
    }
  }

  test("serving reads sketch rows, not history: store is O(groups x batches)") {
    val store = tmpDir("graft-sketchstore-size")
    SketchStore.append(store, events, "event_type", "user_id")
    SketchStore.append(store, events, "event_type", "user_id")
    val rows = spark.read.parquet(store).count()
    assert(rows == 10L, s"2 batches x 5 types = 10 sketch rows, got $rows")
  }
}
