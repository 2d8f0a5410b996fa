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
    val rows = graft.ops.StoreManifest.readPinned(spark, store).count()
    assert(rows == 10L, s"2 batches x 5 types = 10 sketch rows, got $rows")
  }

  test("a reader racing appends sees a committed batch prefix, never a torn batch") {
    val store = tmpDir("graft-sketchstore-race")
    val batches = (0 until 4).map(i => events.filter(col("event_id") % 4 === i))
    // every committed prefix's expected estimates, computed on a twin store
    val twin = tmpDir("graft-sketchstore-race-twin")
    def estimates(s: String): Map[String, Long] =
      SketchStore.estimate(spark, s)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SketchStore.append(store, batches(0), "event_type", "user_id")
    SketchStore.append(twin, batches(0), "event_type", "user_id")
    val valid = scala.collection.mutable.Set(estimates(twin))
    val expectedPrefixes = (1 until 4).map { i =>
      SketchStore.append(twin, batches(i), "event_type", "user_id")
      estimates(twin)
    }
    valid ++= expectedPrefixes
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try while (!stop.get()) observed.add(estimates(store))
      catch { case t: Throwable => failures.add(t) }
    })
    reader.start()
    try (1 until 4).foreach(i =>
      SketchStore.append(store, batches(i), "event_type", "user_id"))
    finally { stop.set(true); reader.join(120000) }
    observed.add(estimates(store))
    assert(failures.isEmpty, s"reader crashed mid-append: ${failures.peek()}")
    import scala.jdk.CollectionConverters._
    observed.asScala.zipWithIndex.foreach { case (o, i) =>
      assert(valid.contains(o),
        s"read $i is not the estimate of any committed batch prefix: $o")
    }
    assert(observed.asScala.last == expectedPrefixes.last)
  }
}
