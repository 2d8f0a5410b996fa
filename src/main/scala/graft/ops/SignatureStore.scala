package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature store: the serving layout for steady-state
  * crawl dedup at rest. [[Extensions15.incrementalSignatureDedup]] is the
  * compute; this is where the corpus side LIVES between batches — band
  * postings written `partitionBy(cell)` where cell = a hash of the
  * (band, band-hash) key, so an incoming batch reads ONLY the cells its
  * own band keys land in. Small batches (the steady-state case: a crawl
  * increment against a billion-doc store) touch a bounded cell subset;
  * the rest of the store is pruned at the directory level — the same
  * static-pruning discipline as [[IvfStore]] (literal `isin`, visible as
  * `PartitionFilters`, asserted in SignatureStoreSpec).
  *
  * Postings are DENORMALIZED: each row carries the full 32-long signature
  * next to its band key, so the verdict (estimated Jaccard over matching
  * positions) computes from the pruned read alone — no second,
  * unprunable join back to a signature table. Cost: bands× copies of the
  * signature (~8× of 256 bytes/doc) — a fraction of a percent of corpus
  * text, the price of never re-reading ANY corpus-side data beyond the
  * probed cells.
  */
object SignatureStore {

  /** Number of cell directories. 256 bounds the directory count while
    * giving a small batch real pruning (a 1000-doc batch probes ≤ 8000
    * band keys → typically all cells only once the batch is large enough
    * that pruning stops mattering anyway).
    */
  val Cells = 256

  private def cellOf(band: org.apache.spark.sql.Column, bh: org.apache.spark.sql.Column) =
    pmod(xxhash64(band, bh), lit(Cells.toLong)).cast("int")

  /** Explode signatures (doc_id, h0..h31) into band postings with the
    * full signature riding along.
    */
  private def postings(sigs: DataFrame): DataFrame = {
    val rows = Extensions.MinhashPerms / Extensions.LshBands
    val bandCols = (0 until Extensions.LshBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(":", (bnd * rows until (bnd + 1) * rows).map(i => col(s"h$i")): _*)
          .as("bh"))
    }
    sigs.select(col("doc_id") +: (0 until Extensions.MinhashPerms).map(i => col(s"h$i"))
        :+ explode(array(bandCols: _*)).as("b"): _*)
      .withColumn("band", col("b.band"))
      .withColumn("bh", col("b.bh"))
      .drop("b")
      .withColumn("cell", cellOf(col("band"), col("bh")))
  }

  /** Write (or overwrite) the store from a signature table. The
    * repartition on cell keeps each cell's rows in one task — without it
    * a partitionBy write fans out to (tasks × cells) small files (8192
    * at 32 tasks; measured 2× the whole query's cost), the classic
    * small-files failure a 100 TB store cannot afford.
    *
    * All writes commit through [[StoreManifest]]: data lands in a fresh
    * batch dir, the manifest rename publishes it atomically — a reader
    * concurrent with ANY write (append or compaction) sees the pre- or
    * post-state, never a torn mix.
    */
  def write(sigs: DataFrame, path: String): Unit = {
    val spark = sigs.sparkSession
    val batch = StoreManifest.newBatchDirName(spark, path)
    postings(sigs).repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/$batch")
    StoreManifest.publish(spark, path,
      StoreManifest.listBatchFiles(spark, path, batch))
  }

  /** Append a new batch's signatures (after its dedup verdict kept them)
    * — only the touched cells gain files; the commit is the manifest
    * rename (old list + the new batch's files).
    */
  def append(sigs: DataFrame, path: String): Unit = {
    val spark = sigs.sparkSession
    val pinned = StoreManifest.files(spark, path)
    val batch = StoreManifest.newBatchDirName(spark, path)
    postings(sigs).repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/$batch")
    StoreManifest.publish(spark, path,
      pinned ++ StoreManifest.listBatchFiles(spark, path, batch))
  }

  /** Compact deleted documents OUT of the store — the missing half of
    * "the store is where the corpus lives between batches": the
    * pipeline's own dedup/decontamination (x72/x77) later REMOVES docs,
    * and an append-only store would serve their stale postings as dup
    * verdicts forever.
    *
    * Removal is signature-driven because that is what makes it
    * PRUNABLE: a doc's postings live in exactly the cells its band keys
    * hash to, so the removed docs' signatures give a bounded cell list
    * (driver-side, O(cells) ints — the dedup probe shape), and only
    * those cells' files are read and anti-joined on doc_id. The
    * survivors land in a FRESH batch dir, and the commit is one
    * manifest rename: (pinned files outside the touched cells) + (the
    * compacted batch) — emptied cells simply have no files in the new
    * manifest. Old files are never touched, so a reader pinned to the
    * pre-compaction version keeps its exact snapshot ([[StoreManifest]];
    * StoreManifestSpec races this). Returns the touched cell ids.
    */
  def compact(spark: SparkSession, path: String, removeSigs: DataFrame): Set[Int] = {
    val posts = Extensions.materialized(postings(removeSigs))
    val cells = posts.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (cells.isEmpty) return Set.empty
    val cellSet = cells.map(_.toString).toSet
    val pinned = StoreManifest.files(spark, path)
    val removeIds = broadcast(removeSigs.select(col("doc_id")).distinct())
    val kept = StoreManifest.readFiles(spark, path, pinned)
      .filter(col("cell").isin(cells: _*))
      .join(removeIds, Seq("doc_id"), "left_anti")
    val batch = StoreManifest.newBatchDirName(spark, path)
    kept.repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/$batch")
    val untouched = pinned.filterNot(f =>
      StoreManifest.partValueOf(f, "cell").exists(cellSet.contains))
    StoreManifest.publish(spark, path,
      untouched ++ StoreManifest.listBatchFiles(spark, path, batch))
    cells.toSet
  }

  /** Signature-only incremental dedup of a batch against the store —
    * identical semantics to [[Extensions15.incrementalSignatureDedup]]
    * (band candidates, estimated-Jaccard verdict, best match above
    * `threshold`, ties to the lowest corpus id), but the corpus side is
    * the PRUNED store read: the batch's band keys hash to a bounded cell
    * list, collected driver-side (O(cells) ints — the IvfStore probe
    * shape) and pushed as a literal `isin` partition filter.
    */
  def dedupAgainstStore(
      spark: SparkSession, path: String, batchSigs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val batchPosts = Extensions.materialized(postings(batchSigs))
    val cells = batchPosts.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // readPinned: one manifest read pins the snapshot for the whole query
    val store = StoreManifest.readPinned(spark, path)
      .filter(col("cell").isin(cells: _*))
    val matches = (0 until Extensions.MinhashPerms)
      .map(i => when(col(s"c.h$i") === col(s"b.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b_id")).orderBy(col("est_jaccard").desc, col("c_id"))
    val best = store.as("c")
      .join(batchPosts.as("b"),
        col("c.band") === col("b.band") && col("c.bh") === col("b.bh"))
      .select(col("c.doc_id").as("c_id"), col("b.doc_id").as("b_id"),
        Extensions.round4o(matches / Extensions.MinhashPerms.toDouble)
          .as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("b_id"), col("c_id").as("dup_of"), col("est_jaccard"))
    batchSigs.select(col("doc_id").as("b_id"))
      .join(best, Seq("b_id"), "left_outer")
      .select(col("b_id"), col("dup_of").isNull.as("keep"),
        col("dup_of"), col("est_jaccard"))
  }
}
