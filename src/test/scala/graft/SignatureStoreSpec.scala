package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions15, SignatureStore}

/** The persisted signature-store serving path: written store answers
  * identically to the in-memory signature dedup, the batch read prunes
  * to its band cells, and append grows the store incrementally.
  */
class SignatureStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private def sigs(pred: org.apache.spark.sql.Column) =
    Extensions15.minhashSignatures(docs.filter(pred), "doc_id", "text")

  test("store dedup answers bit-identically to the in-memory signature dedup") {
    val root = tmpDir("sigstore")
    SignatureStore.write(sigs(col("doc_id") < 450), root)
    val fromStore = SignatureStore.dedupAgainstStore(
        spark, root, sigs(col("doc_id") >= 450))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    val inMemory = Extensions15.incrementalSignatureDedup(
        sigs(col("doc_id") < 450), sigs(col("doc_id") >= 450))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(fromStore == inMemory,
      s"store diverged: only-store=${fromStore -- inMemory}, only-mem=${inMemory -- fromStore}")
    assert(fromStore.nonEmpty)
  }

  test("the store read prunes to the batch's band cells (PartitionFilters on cell)") {
    val root = tmpDir("sigprune")
    SignatureStore.write(sigs(col("doc_id") < 450), root)
    // a small batch whose ids INCLUDE a known near-dup (487 -> 45 at this
    // sf): the candidate join must stay non-empty, or AQE's empty-relation
    // propagation deletes the store scan and there is no filter to assert
    val df = SignatureStore.dedupAgainstStore(spark, root, sigs(col("doc_id") >= 480))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // >10 literals render as INSET rather than IN in the scan line
    val pf = "PartitionFilters: \\[[^\\]]*cell#\\d+ (?:IN \\(([^)]*)\\)|INSET ([^\\]]*))\\]".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"store read must partition-prune on cell:\n$plan"))
    // 20 batch docs x 8 bands = at most 160 of the 256 cell dirs
    val touched = Option(pf.group(1)).getOrElse(pf.group(2)).split(",").length
    assert(touched <= 160, s"expected <= 160 probed cells, got $touched")
  }

  test("streaming crawl loop: batches dedup against the store, survivors' SIGNATURES append") {
    import spark.implicits._
    // The steady-state crawl at rest: the store holds signatures only
    // (256 bytes/doc — no text is ever retained), each micro-batch signs
    // itself, dedups against the PRUNED store read, and appends the
    // survivors' signatures — so a doc admitted in batch N dedups its
    // copies in batch N+1 without any text reread.
    val root = tmpDir("sigstream")
    val spool = s"$root/spool"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    val seedA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val novelB = "totally new content that matches nothing currently stored anywhere"
    graft.ops.SignatureStore.write(
      graft.ops.Extensions15.minhashSignatures(
        Seq((1L, seedA), (2L, "one two three four five six seven eight nine ten"))
          .toDF("doc_id", "text"), "doc_id", "text"), store)
    Seq((10L, seedA), (11L, novelB))
      .toDF("doc_id", "text").write.mode("append").parquet(spool)
    val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(spool)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val sigsB = graft.ops.Extensions15.minhashSignatures(batch, "doc_id", "text")
          val kept = sigsB.join(
            graft.ops.SignatureStore.dedupAgainstStore(spark, store, sigsB)
              .filter(col("keep")).select(col("b_id").as("doc_id")),
            Seq("doc_id"), "left_semi")
          graft.ops.SignatureStore.append(kept, store)
        }
      }
      .start()
    q.processAllAvailable()
    // batch 2: a copy of the BATCH-1 ADMISSION + a novel doc — proves the
    // store growth gates later arrivals
    Seq((20L, novelB), (21L, "yet another brand new document unlike all previous ones written"))
      .toDF("doc_id", "text").write.mode("append").parquet(spool)
    q.processAllAvailable()
    q.stop()
    val ids = graft.ops.StoreManifest.readPinned(spark, store)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L, 21L),
      s"expected near-dups 10 (vs seed) and 20 (vs batch-1 admission) rejected, got $ids")
  }

  test("append-grown store equals a store written from the union") {
    val root = tmpDir("siggrow")
    val rootFull = tmpDir("sigfull")
    SignatureStore.write(sigs(col("doc_id") < 300), root)
    SignatureStore.append(sigs(col("doc_id") >= 300 && col("doc_id") < 450), root)
    SignatureStore.write(sigs(col("doc_id") < 450), rootFull)
    val batch = sigs(col("doc_id") >= 450)
    val grown = SignatureStore.dedupAgainstStore(spark, root, batch)
      .collect().map(_.toSeq).toSet
    val full = SignatureStore.dedupAgainstStore(spark, rootFull, batch)
      .collect().map(_.toSeq).toSet
    assert(grown == full, "append must be indistinguishable from a full rewrite")
  }

  test("compaction removes a doc's postings, flips its dedup verdict, and touches only its cells") {
    val root = tmpDir("sigcompact")
    SignatureStore.write(sigs(col("doc_id") < 450), root)
    val batch = sigs(col("doc_id") >= 480)
    val before = SignatureStore.dedupAgainstStore(spark, root, batch)
      .filter(!col("keep"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(before.nonEmpty, "fixture must produce at least one dup verdict (487 -> 45)")
    val dupTargets = before.values.toSet.toSeq
    // pin the pre-compaction manifest: untouched cells must keep their
    // exact files in the NEW manifest (not just on disk)
    val pinnedBefore = graft.ops.StoreManifest.files(spark, root)
    val removeSigs = sigs(col("doc_id").isin(dupTargets.map(Long.box): _*))
    val touched = SignatureStore.compact(spark, root, removeSigs)
    // 8 LSH bands per doc -> at most removedDocs x 8 touched cells
    assert(touched.nonEmpty && touched.size <= dupTargets.size * 8,
      s"compaction must touch at most removedDocs x bands cells, got ${touched.size}")
    // untouched cells: the new manifest carries the SAME files as before
    val touchedStr = touched.map(_.toString)
    def cellOfFile(f: String) = graft.ops.StoreManifest.partValueOf(f, "cell")
    val untouchedBefore = pinnedBefore.filterNot(f => cellOfFile(f).exists(touchedStr)).toSet
    val pinnedAfter = graft.ops.StoreManifest.files(spark, root)
    val untouchedAfter = pinnedAfter.filterNot(f => cellOfFile(f).exists(touchedStr)).toSet
    assert(untouchedBefore.nonEmpty, "fixture must leave some cells untouched")
    assert(untouchedAfter == untouchedBefore,
      "compaction must not replace files of untouched cells")
    // and every pre-compaction file is STILL on disk (snapshot isolation:
    // a reader pinned to the old version keeps its exact state)
    pinnedBefore.foreach { p =>
      assert(new java.io.File(s"$root/$p").exists(), s"pinned file vanished: $p") }
    // the removed docs serve no verdicts anymore
    val after = SignatureStore.dedupAgainstStore(spark, root, batch)
    val afterDupOf = after.filter(!col("keep"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    afterDupOf.values.foreach { c =>
      assert(!dupTargets.contains(c), s"compacted doc $c still serves a dup verdict") }
    // and at least one previously-dup batch doc flipped to keep (or
    // re-matched a different survivor — either way never the removed id)
    val flipped = before.keySet -- afterDupOf.keySet
    assert(flipped.nonEmpty, "compacting the dup targets must flip some verdict to keep")
    // store rows for the removed ids are fully gone from the live snapshot
    val remaining = graft.ops.StoreManifest.readPinned(spark, root)
      .filter(col("doc_id").isin(dupTargets.map(Long.box): _*)).count()
    assert(remaining == 0, s"$remaining stale postings survived compaction")
  }

  test("geometryPlan: recall and candidate cost shrink together as rows grow; chosen reaches target") {
    val corpus = graft.model.Tables.load(spark, sf0001, "documents")
    val plan = graft.ops.SignatureStore.geometryPlan(corpus, "doc_id", "text",
        threshold = 0.5, targetRecall = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(plan.map(_._1).toSeq == Seq(32L, 16L, 8L, 4L, 2L, 1L))
    assert(plan.forall { case (b, rw, _, _, _, _, _) => b * rw == 32L })
    // nested band boundaries -> candidates and recall are monotone
    // non-increasing as rows per band grow
    assert(plan.map(_._4).sliding(2).forall(p => p(0) >= p(1)),
      s"candidates must shrink with rows: ${plan.mkString(",")}")
    assert(plan.map(_._6).sliding(2).forall(p => p(0) >= p(1)),
      s"recall must shrink with rows: ${plan.mkString(",")}")
    assert(plan.head._6 == 1.0 || plan.head._6 >= plan.last._6)
    val chosen = plan.filter(_._7)
    assert(chosen.length == 1, s"exactly one chosen row: ${plan.mkString(",")}")
    // chosen = cheapest geometry at target (fewest bands — candidate
    // count is monotone in bands, so fewest bands = min cost; ties on
    // candidate count resolve to fewer bands), or the 32-band fallback
    val reaching = plan.filter(_._6 >= 0.9)
    if (reaching.nonEmpty) {
      assert(chosen.head._6 >= 0.9, s"chosen must reach target: ${plan.mkString(",")}")
      assert(chosen.head._4 == reaching.map(_._4).min,
        s"chosen must be the cheapest reaching target: ${plan.mkString(",")}")
      assert(chosen.head._1 == reaching.map(_._1).min,
        s"ties resolve to fewest bands: ${plan.mkString(",")}")
    } else assert(chosen.head._1 == 32L)
  }

  test("the chosen geometry feeds a store build and changes what the store can catch") {
    import spark.implicits._
    // near-dup pair: long shared prefix, different tail
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 36).map(i => s"tok$i").mkString(" ") + " other words entirely here"
    val stored = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq((9L, near)).toDF("doc_id", "text")
    val sigsStored = Extensions15.minhashSignatures(stored, "doc_id", "text")
    val sigsBatch = Extensions15.minhashSignatures(batch, "doc_id", "text")
    // 32 bands x 1 row: any shared minhash position -> candidate; the
    // near-dup must be caught
    val rootWide = tmpDir("geom_wide")
    SignatureStore.write(sigsStored, rootWide, bands = 32)
    val wide = SignatureStore.dedupAgainstStore(spark, rootWide, sigsBatch, 0.3)
      .collect().head
    assert(!wide.getBoolean(1), s"32x1 must catch the near-dup: $wide")
    // 1 band x 32 rows: candidate only on a FULL signature match; the
    // near-dup (not exact) must be missed — geometry demonstrably
    // reaches the serving path
    val rootNarrow = tmpDir("geom_narrow")
    SignatureStore.write(sigsStored, rootNarrow, bands = 1)
    val narrow = SignatureStore.dedupAgainstStore(spark, rootNarrow, sigsBatch, 0.3)
      .collect().head
    assert(narrow.getBoolean(1), s"1x32 must miss the near-dup: $narrow")
    // append + compact run under the STORED geometry (the sidecar, not
    // the default): appending the batch to the wide store and re-probing
    // an exact copy still dedups
    SignatureStore.append(sigsBatch, rootWide)
    val re = SignatureStore.dedupAgainstStore(spark, rootWide,
        Extensions15.minhashSignatures(Seq((99L, near)).toDF("doc_id", "text"),
          "doc_id", "text"), 0.3)
      .collect().head
    assert(!re.getBoolean(1) && re.getLong(2) == 9L,
      s"exact copy must dedup against the appended doc under stored geometry: $re")
  }

  test("compacting every doc of a small store empties its manifest; vacuum reclaims the files") {
    import spark.implicits._
    val root = tmpDir("sigcompact_empty")
    val tiny = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val s1 = Extensions15.minhashSignatures(tiny, "doc_id", "text")
    SignatureStore.write(s1, root)
    val touched = SignatureStore.compact(spark, root, s1)
    assert(touched.nonEmpty)
    // the live snapshot references no files at all
    assert(graft.ops.StoreManifest.files(spark, root).isEmpty,
      "emptied cells must drop out of the manifest entirely")
    // vacuum reclaims the superseded version's data files
    val deleted = graft.ops.StoreManifest.vacuum(spark, root, retentionMs = 0L)
    assert(deleted.nonEmpty, "vacuum must reclaim the pre-compaction files")
    val batchDirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
    assert(batchDirs.isEmpty, s"no data file may survive a full vacuum: ${batchDirs.mkString(",")}")
  }
}
