package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.{Extensions15, SignatureStore, StoreManifest}

/** The atomic-commit contract of the persisted stores: a reader
  * concurrent with an append or compaction sees the pre-state or the
  * post-state, NEVER a torn mix — proven two ways: deterministically
  * (a pinned file list survives a compaction byte-identical) and by
  * racing a live reader loop against the compaction.
  */
class StoreManifestSpec extends SparkSpec {

  private def sigs(pred: org.apache.spark.sql.Column) =
    Extensions15.minhashSignatures(
      Tables.load(spark, sf0001, "documents").filter(pred), "doc_id", "text")

  private def verdictSet(root: String, batch: org.apache.spark.sql.DataFrame) =
    SignatureStore.dedupAgainstStore(spark, root, batch)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

  test("a pinned snapshot survives a compaction unchanged; a fresh pin sees the post-state") {
    val root = tmpDir("manifest_pin")
    SignatureStore.write(sigs(col("doc_id") < 450), root)
    val pin = StoreManifest.files(spark, root)
    val v1 = StoreManifest.currentVersion(spark, root).get
    val preRows = StoreManifest.readFiles(spark, root, pin)
      .select("doc_id").distinct().count()
    // compact half the store's docs away
    val removeSigs = sigs(col("doc_id") < 200)
    assert(SignatureStore.compact(spark, root, removeSigs).nonEmpty)
    // the OLD pin still reads the exact pre-compaction state (files untouched)
    val pinnedRows = StoreManifest.readFiles(spark, root, pin)
      .select("doc_id").distinct().count()
    assert(pinnedRows == preRows,
      s"pinned snapshot changed under a compaction: $preRows -> $pinnedRows")
    // a FRESH pin is the post-state: no removed doc remains
    val v2 = StoreManifest.currentVersion(spark, root).get
    assert(v2 > v1, "compaction must publish a new version")
    val live = StoreManifest.readPinned(spark, root)
      .filter(col("doc_id") < 200).count()
    assert(live == 0, s"$live removed docs still in the live snapshot")
  }

  test("a reader racing a compaction answers pre- or post-state, never a mix") {
    val root = tmpDir("manifest_race")
    SignatureStore.write(sigs(col("doc_id") < 450), root)
    val batch = sigs(col("doc_id") >= 480)
    val pre = verdictSet(root, batch)
    // compute the post-state on an identical twin store first, so the
    // racy observations can be checked against BOTH endpoints
    val twin = tmpDir("manifest_race_twin")
    SignatureStore.write(sigs(col("doc_id") < 450), twin)
    val dupTargets = pre.collect { case (_, false, d) if d >= 0 => d }.toSeq
    assert(dupTargets.nonEmpty, "fixture must produce dup verdicts")
    val removeSigs = sigs(col("doc_id").isin(dupTargets.map(Long.box): _*))
    SignatureStore.compact(spark, twin, removeSigs)
    val post = verdictSet(twin, batch)
    assert(post != pre, "compaction must change the verdicts for the race to mean anything")
    // race: reader loop on the REAL store while it compacts
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Boolean, Long)]]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reader = new Thread(() => {
      try while (!stop.get()) observed.add(verdictSet(root, batch))
      catch { case t: Throwable => failures.add(t) }
    })
    reader.start()
    try SignatureStore.compact(spark, root, removeSigs)
    finally { stop.set(true); reader.join(120000) }
    // one last read after the commit — guaranteed post-state
    observed.add(verdictSet(root, batch))
    assert(failures.isEmpty, s"reader must never crash mid-commit: ${failures.peek()}")
    import scala.jdk.CollectionConverters._
    observed.asScala.zipWithIndex.foreach { case (o, i) =>
      assert(o == pre || o == post,
        s"read $i saw a torn state: ${(o -- pre) ++ (o -- post)}")
    }
    assert(observed.asScala.last == post, "the final read must be the post-state")
  }

  test("compactSmallPartitions heals a fragmented store to one file per flagged cell with identical answers") {
    val root = tmpDir("manifest_heal")
    // fragment: a seed write plus 6 tiny appends -> every touched cell
    // accumulates one micro-file per batch
    SignatureStore.write(sigs(col("doc_id") < 100), root)
    (0 until 6).foreach { i =>
      SignatureStore.append(
        sigs(col("doc_id") >= 100 + i * 50 && col("doc_id") < 100 + (i + 1) * 50), root)
    }
    val batch = sigs(col("doc_id") >= 480)
    val before = verdictSet(root, batch)
    def filesPerCell(): Map[String, Int] =
      StoreManifest.files(spark, root)
        .groupBy(f => StoreManifest.partValueOf(f, "cell").get)
        .map { case (c, fs) => c -> fs.length }
    val fragmented = filesPerCell()
    assert(fragmented.values.max > 1, "fixture must actually fragment")
    val healed = StoreManifest.compactSmallPartitions(spark, root, "cell")
    assert(healed.nonEmpty, "micro-file cells must be flagged")
    val after = filesPerCell()
    healed.foreach { c =>
      assert(after(c) == 1, s"healed cell $c still has ${after(c)} files") }
    assert(verdictSet(root, batch) == before,
      "healing the layout must not change a single answer")
    // idempotent: a second pass finds nothing left to heal
    assert(StoreManifest.compactSmallPartitions(spark, root, "cell").isEmpty)
  }

  test("vacuum keeps the live version readable and removes only superseded files") {
    val root = tmpDir("manifest_vacuum")
    SignatureStore.write(sigs(col("doc_id") < 300), root)
    SignatureStore.append(sigs(col("doc_id") >= 300 && col("doc_id") < 450), root)
    SignatureStore.compact(spark, root, sigs(col("doc_id") < 100))
    val liveBefore = StoreManifest.readPinned(spark, root)
      .select("doc_id").distinct().count()
    val deleted = StoreManifest.vacuum(spark, root)
    assert(deleted.nonEmpty, "three versions must leave something to reclaim")
    val liveAfter = StoreManifest.readPinned(spark, root)
      .select("doc_id").distinct().count()
    assert(liveAfter == liveBefore, "vacuum must never touch the live snapshot")
    val liveFiles = StoreManifest.files(spark, root).toSet
    assert(deleted.forall(f => !liveFiles.contains(f)),
      "vacuum must delete only unreferenced files")
  }
}
