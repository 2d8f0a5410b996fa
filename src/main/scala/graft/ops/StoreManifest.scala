package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic snapshot commits for the persisted stores ([[PqStore]],
  * [[SignatureStore]], [[PostingStore]]) — the manifest discipline of
  * every production table format (Delta/Iceberg's core idea, reduced to
  * the minimum these stores need):
  *
  * {{{
  *   root/_manifest/v-000000000001.list    (relative data-file paths, one per line)
  *   root/batch=<v>-<rand>/cell=N/part-....parquet
  * }}}
  *
  * Invariants:
  *  - Data files are IMMUTABLE once written: every write (initial build,
  *    append batch, compaction) goes into a fresh `batch-*` directory.
  *    Nothing ever rewrites or deletes a live file in place.
  *  - The manifest is the ONLY source of truth for what a store version
  *    contains, and it is written LAST: tmp file + atomic rename. A
  *    reader that pins a manifest (one metadata read) sees exactly that
  *    version's files forever after, no matter how many appends or
  *    compactions land concurrently — either the pre-state or the
  *    post-state, never a torn mix (StoreManifestSpec races a reader
  *    against a compaction to prove it).
  *  - Old versions' files stay on disk until [[vacuum]] — snapshot reads
  *    keep working across a compaction; space is reclaimed explicitly,
  *    after in-flight readers drain (the reader-lease window is the
  *    operator's retention policy, exactly as in Delta/Iceberg VACUUM).
  *
  * Partition pruning survives: batches are read with `basePath = root`,
  * so the `cell=N` / `bucket=N` path segments below each batch dir still
  * surface as partition columns and a literal `isin` still prunes at
  * file-index level (the store specs assert PartitionFilters unchanged).
  *
  * Scale: the manifest is O(files) NAMES — kilobytes for thousands of
  * files. A 100 TB store with millions of files shards the list (the
  * Iceberg manifest-list layer); the single-file form here keeps the
  * commit protocol — write-last, rename-atomic, read-first — identical.
  * Single committing writer per store is assumed (the stores' existing
  * contract); concurrent readers are the point.
  */
object StoreManifest {

  val ManifestDir = "_manifest"
  private val VersionRe = """v-(\d{12})\.list""".r

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Latest committed version, if any manifest exists. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, rootP) = fsOf(spark, root)
    val mdir = new Path(rootP, ManifestDir)
    if (!fs.exists(mdir)) None
    else fs.listStatus(mdir).iterator.map(_.getPath.getName).collect {
      case VersionRe(v) => v.toLong
    }.maxOption
  }

  def hasManifest(spark: SparkSession, root: String): Boolean =
    currentVersion(spark, root).isDefined

  /** The pinned file list of `version` (relative to root). This is the
    * reader's snapshot pin: hold the list, and [[readFiles]] serves that
    * exact state regardless of later commits.
    */
  def filesAt(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val (fs, rootP) = fsOf(spark, root)
    val mf = new Path(new Path(rootP, ManifestDir), f"v-$version%012d.list")
    val in = fs.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Current version's file list — one metadata read; the atomic pin. */
  def files(spark: SparkSession, root: String): Seq[String] =
    currentVersion(spark, root) match {
      case Some(v) => filesAt(spark, root, v)
      case None => throw new IllegalStateException(
        s"StoreManifest: no committed version under $root/$ManifestDir")
    }

  /** A fresh, unique batch directory name for the NEXT commit. Unique by
    * construction (random suffix), so a crashed write leaves only an
    * orphan directory no manifest references — invisible to readers,
    * reclaimed by [[vacuum]].
    *
    * `batch=` (a k=v segment) rather than `batch-`: partition inference
    * walks each file's path up toward basePath and STOPS at the first
    * non-`k=v` directory, so a plain batch dir between basePath and
    * `cell=N` would both hide the real partition column and make
    * different batches look like conflicting table roots
    * (CONFLICTING_DIRECTORY_STRUCTURES). As a partition segment the
    * batch id rides along as one extra column that [[readFiles]] drops —
    * `batch` is therefore a reserved column name inside the stores.
    */
  def newBatchDirName(spark: SparkSession, root: String): String = {
    val v = currentVersion(spark, root).getOrElse(0L) + 1L
    f"batch=$v%06d-${java.util.UUID.randomUUID.toString.take(8)}"
  }

  /** Data files under a just-written batch dir, relative to root. */
  def listBatchFiles(spark: SparkSession, root: String, batchRel: String): Seq[String] = {
    val (fs, rootP) = fsOf(spark, root)
    val base = new Path(rootP, batchRel)
    val it = fs.listFiles(base, true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val rootUri = fs.makeQualified(rootP).toUri.getPath
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val full = f.getPath.toUri.getPath
        out += full.stripPrefix(rootUri).stripPrefix("/")
      }
    }
    out.toSeq
  }

  /** Commit `files` as the next version: write the list to a tmp file,
    * rename into place (write-last — the rename IS the commit point),
    * return the published version.
    */
  def publish(spark: SparkSession, root: String, files: Seq[String]): Long = {
    val (fs, rootP) = fsOf(spark, root)
    val mdir = new Path(rootP, ManifestDir)
    fs.mkdirs(mdir)
    var v = currentVersion(spark, root).getOrElse(0L) + 1L
    while (fs.exists(new Path(mdir, f"v-$v%012d.list"))) v += 1L
    val tmp = new Path(mdir,
      s".tmp-$v-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(mdir, f"v-$v%012d.list")
    require(fs.rename(tmp, dest),
      s"StoreManifest: commit rename failed for $dest (concurrent writer?)")
    v
  }

  /** Read an explicit pinned file list. `basePath = root` keeps the
    * partition columns (`cell=`/`bucket=` path segments) and their
    * pruning exactly as a whole-directory read would.
    */
  def readFiles(spark: SparkSession, root: String, files: Seq[String]): DataFrame = {
    require(files.nonEmpty,
      s"StoreManifest: empty snapshot under $root — nothing to read")
    val (fs, rootP) = fsOf(spark, root)
    val base = fs.makeQualified(rootP).toString
    spark.read.option("basePath", base)
      .parquet(files.map(f => s"$base/$f"): _*)
      .drop("batch")
  }

  /** Read the CURRENT snapshot (pin + read in one call). */
  def readPinned(spark: SparkSession, root: String): DataFrame =
    readFiles(spark, root, files(spark, root))

  /** Delete data files referenced by NO surviving manifest (keeping the
    * newest `keepVersions` manifests), plus emptied batch dirs and the
    * dropped manifests themselves. Returns deleted relative paths. Run
    * only after in-flight readers of dropped versions have drained.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1)
    val (fs, rootP) = fsOf(spark, root)
    val mdir = new Path(rootP, ManifestDir)
    if (!fs.exists(mdir)) return Nil
    val versions = fs.listStatus(mdir).iterator.map(_.getPath.getName).collect {
      case VersionRe(v) => v.toLong
    }.toSeq.sorted
    if (versions.isEmpty) return Nil
    val (drop, keep) = versions.splitAt(math.max(0, versions.length - keepVersions))
    val referenced = keep.flatMap(v => filesAt(spark, root, v)).toSet
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    val rootUri = fs.makeQualified(rootP).toUri.getPath
    fs.listStatus(rootP).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("batch=")).foreach { b =>
      val it = fs.listFiles(b.getPath, true)
      val toDelete = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile) {
          val rel = f.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
          if (!referenced.contains(rel)) { toDelete += f.getPath; deleted += rel }
        }
      }
      toDelete.foreach(fs.delete(_, false))
      // drop the batch dir when nothing referenced survives under it
      val remaining = fs.listFiles(b.getPath, true)
      var any = false
      while (remaining.hasNext) { remaining.next(); any = true }
      if (!any) fs.delete(b.getPath, true)
    }
    drop.foreach(v => fs.delete(new Path(mdir, f"v-$v%012d.list"), false))
    deleted.toSeq
  }

  /** Heal the small-files partitions of a manifest store — the
    * [[Scale.storeLayoutAudit]] signal wired into the maintenance verb
    * it exists to trigger (the measure-then-act pattern of autoSalted,
    * applied to layout). Per partition value of `partCol` in the LIVE
    * snapshot: if it holds more than one file and its mean file size is
    * below `smallBytes` (the audit's flag, computed here from the same
    * filesystem metadata, manifest-aware), its rows are rewritten into
    * the next batch dir — one task per partition via
    * `repartition(partCol)`, so each healed partition lands as a single
    * file — and ONE manifest rename publishes (untouched files) +
    * (rewritten partitions). Query answers are identical by
    * construction (same rows, new layout; StoreManifestSpec asserts
    * it); readers pinned mid-heal keep their snapshot.
    *
    * Scale: the scan cost is one read+write of ONLY the flagged
    * partitions' bytes — which are small by definition of the flag;
    * the decision is O(files) filesystem metadata, zero Spark jobs.
    * Partitions above the flag threshold are never touched, so a
    * steady-state store converges: heal, and subsequent audits are
    * quiet until appends fragment it again.
    */
  def compactSmallPartitions(
      spark: SparkSession, root: String, partCol: String,
      smallBytes: Long = 8L << 20): Set[String] = {
    val (fs, rootP) = fsOf(spark, root)
    val pinned = files(spark, root)
    val sized = pinned.map { f =>
      (f, partValueOf(f, partCol),
        fs.getFileStatus(new Path(rootP, f)).getLen)
    }
    val flagged = sized.groupBy(_._2).collect {
      case (Some(part), fs0)
        if fs0.length > 1 && fs0.map(_._3).sum / fs0.length < smallBytes => part
    }.toSet
    if (flagged.isEmpty) return Set.empty
    val moving = sized.collect { case (f, Some(p), _) if flagged.contains(p) => f }
    val batch = newBatchDirName(spark, root)
    import org.apache.spark.sql.functions.col
    readFiles(spark, root, moving)
      .repartition(col(partCol))
      .write.partitionBy(partCol).mode("overwrite").parquet(s"$root/$batch")
    val untouched = pinned.filterNot(moving.toSet)
    publish(spark, root, untouched ++ listBatchFiles(spark, root, batch))
    flagged
  }

  /** The `k=v` partition value a relative file path carries for
    * `partCol`, if any — compaction uses it to subtract a rewritten
    * partition's old files from the next manifest.
    */
  def partValueOf(rel: String, partCol: String): Option[String] = {
    val prefix = partCol + "="
    rel.split('/').find(_.startsWith(prefix)).map(_.substring(prefix.length))
  }
}
