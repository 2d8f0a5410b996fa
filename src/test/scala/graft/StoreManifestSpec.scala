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

  test("a failed commit put never becomes current (S3-semantics injection)") {
    val root = tmpDir("manifest_failput")
    SignatureStore.write(sigs(col("doc_id") < 300), root)
    val batch = sigs(col("doc_id") >= 480)
    val preVersion = StoreManifest.currentVersion(spark, root).get
    val preFiles = StoreManifest.files(spark, root)
    val preVerdicts = verdictSet(root, batch)
    // inject the object-store failure mode: the conditional put does not
    // take effect (copy+delete rename lost the race / If-None-Match 412)
    val realPut = StoreManifest.commitPut
    StoreManifest.commitPut = (_, _, _) => false
    try {
      // an overwrite write with NEW geometry — the exact scenario where a
      // torn commit would leave new geometry over old postings
      val thrown = intercept[IllegalArgumentException] {
        SignatureStore.write(sigs(col("doc_id") < 300), root, bands = 16)
      }
      assert(thrown.getMessage.contains("commit put failed"))
    } finally StoreManifest.commitPut = realPut
    // nothing published: version, file list, geometry, and every answer
    // are exactly the pre-failure state
    assert(StoreManifest.currentVersion(spark, root).get == preVersion,
      "a failed put must not advance the version")
    assert(StoreManifest.files(spark, root) == preFiles,
      "a failed put must not change the pinned file list")
    assert(verdictSet(root, batch) == preVerdicts,
      "a failed put must not change a single answer")
    // and a retry with the real put succeeds cleanly
    SignatureStore.write(sigs(col("doc_id") < 300), root, bands = 16)
    assert(StoreManifest.meta(spark, root)("bands") == "16")
  }

  test("geometry commits atomically with the file list (one pin, one version)") {
    val root = tmpDir("manifest_geom")
    SignatureStore.write(sigs(col("doc_id") < 200), root, bands = 8)
    assert(StoreManifest.meta(spark, root)("bands") == "8")
    val (files8, meta8) = StoreManifest.pin(spark, root)
    // re-band the store: a fresh pin sees (16-band files, 16-band meta);
    // the OLD pin still pairs the 8-band files with the 8-band geometry
    SignatureStore.write(sigs(col("doc_id") < 200), root, bands = 16)
    val (files16, meta16) = StoreManifest.pin(spark, root)
    assert(meta16("bands") == "16" && meta8("bands") == "8")
    assert(files8.toSet.intersect(files16.toSet).isEmpty,
      "a re-band write must replace every data file")
    // both snapshots stay readable under their own geometry
    assert(StoreManifest.readFiles(spark, root, files8).count() > 0)
    assert(StoreManifest.readFiles(spark, root, files16).count() > 0)
    // appends key under the pinned version's geometry and carry it forward
    SignatureStore.append(sigs(col("doc_id") >= 200 && col("doc_id") < 250), root)
    assert(StoreManifest.meta(spark, root)("bands") == "16")
  }

  test("a pre-manifest store is adopted on first access and then appendable") {
    val root = tmpDir("manifest_legacy")
    // simulate a legacy store: cell-partitioned parquet directly under
    // root (no _manifest), geometry in the old _geometry sidecar
    import org.apache.spark.sql.functions.{lit => flit}
    Tables.load(spark, sf0001, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"), (col("doc_id") % 4).cast("int").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!StoreManifest.hasManifest(spark, root))
    // first manifest access adopts: files move under the legacy batch
    // dir and version 1 publishes
    val adopted = StoreManifest.files(spark, root)
    assert(adopted.nonEmpty &&
      adopted.forall(_.startsWith(StoreManifest.LegacyBatchDir)),
      s"adoption must move every data file under the legacy batch dir: $adopted")
    assert(StoreManifest.currentVersion(spark, root).contains(1L))
    val rows = StoreManifest.readPinned(spark, root)
    assert(rows.count() == 50, "every legacy row survives adoption")
    assert(rows.columns.contains("cell"),
      "partition columns survive the legacy move")
    // adoption is idempotent: a second access re-reads, never re-adopts
    assert(StoreManifest.files(spark, root) == adopted)
    // and the adopted store accepts manifest-committed appends
    val batch2 = "batch=000002-test"
    Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") >= 50 && col("doc_id") < 60)
      .select(col("doc_id"), col("text"), (col("doc_id") % 4).cast("int").as("cell"))
      .write.partitionBy("cell").parquet(s"$root/$batch2")
    StoreManifest.publish(spark, root,
      adopted ++ StoreManifest.listBatchFiles(spark, root, batch2))
    assert(StoreManifest.readPinned(spark, root).count() == 60)
  }

  test("vacuum honors the retention clock: young files survive, aged files reclaim") {
    val root = tmpDir("manifest_retention")
    SignatureStore.write(sigs(col("doc_id") < 200), root)
    val pin = StoreManifest.files(spark, root)
    SignatureStore.compact(spark, root, sigs(col("doc_id") < 100))
    // everything is seconds old: a default-retention vacuum must delete
    // NOTHING, and the superseded pin must still read
    assert(StoreManifest.vacuum(spark, root).isEmpty,
      "files inside the retention window must survive vacuum")
    val pinnedRows = StoreManifest.readFiles(spark, root, pin).count()
    assert(pinnedRows > 0, "a pinned reader inside retention still reads")
    // age every data file past the clock, then vacuum reclaims
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 8L * 24 * 60 * 60 * 1000
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) fs.setTimes(f.getPath, old, -1)
    }
    val deleted = StoreManifest.vacuum(spark, root)
    assert(deleted.nonEmpty, "aged unreferenced files must reclaim")
    // the live snapshot is untouched either way
    assert(StoreManifest.readPinned(spark, root).count() > 0)
    intercept[IllegalArgumentException] {
      StoreManifest.vacuum(spark, root, keepVersions = 0)
    }
  }

  test("vacuum keeps the live version readable and removes only superseded files") {
    val root = tmpDir("manifest_vacuum")
    SignatureStore.write(sigs(col("doc_id") < 300), root)
    SignatureStore.append(sigs(col("doc_id") >= 300 && col("doc_id") < 450), root)
    SignatureStore.compact(spark, root, sigs(col("doc_id") < 100))
    val liveBefore = StoreManifest.readPinned(spark, root)
      .select("doc_id").distinct().count()
    val deleted = StoreManifest.vacuum(spark, root, retentionMs = 0L)
    assert(deleted.nonEmpty, "three versions must leave something to reclaim")
    val liveAfter = StoreManifest.readPinned(spark, root)
      .select("doc_id").distinct().count()
    assert(liveAfter == liveBefore, "vacuum must never touch the live snapshot")
    val liveFiles = StoreManifest.files(spark, root).toSet
    assert(deleted.forall(f => !liveFiles.contains(f)),
      "vacuum must delete only unreferenced files")
  }
}
