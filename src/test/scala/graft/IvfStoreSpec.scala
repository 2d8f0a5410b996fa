package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions2, Extensions3, IvfStore}

/** The persisted-IVF serving path: written index answers identically to
  * the in-memory operator, and the scan actually prunes to probed cells.
  */
class IvfStoreSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("persisted index answers bit-identically to the in-memory ivfTopK") {
    val root = tmpDir("ivfstore")
    val centroids = Extensions3.trainCentroids(emb, "vec_id", "embedding", k = 8)
    IvfStore.writeIndex(emb, "vec_id", "embedding", centroids, root)
    val queries = emb.filter(col("vec_id") < 10)
    val fromStore = IvfStore.topKFromIndex(
        spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val inMemory = Extensions2.ivfTopK(
        emb, queries, centroids, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(fromStore == inMemory,
      s"store path diverged: only-store=${fromStore -- inMemory}, only-mem=${inMemory -- fromStore}")
    assert(fromStore.nonEmpty)
  }

  test("appended vectors are served from the same index with stored-centroid geometry") {
    import spark.implicits._
    val root = tmpDir("ivfappend")
    val old = emb.filter(col("vec_id") < 400)
    val centroids = Extensions3.trainCentroids(old, "vec_id", "embedding", k = 8)
    IvfStore.writeIndex(old, "vec_id", "embedding", centroids, root)
    val newVecs = emb.filter(col("vec_id") >= 400)
    IvfStore.appendToIndex(newVecs, "vec_id", "embedding", root)
    // the grown store answers exactly like in-memory IVF over old+new
    val queries = emb.filter(col("vec_id") < 5)
    val fromStore = IvfStore.topKFromIndex(
        spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val inMemory = Extensions2.ivfTopK(
        emb, queries, centroids, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(fromStore == inMemory, "grown store must equal in-memory over the union")
    // appended rows are actually present
    val served = graft.ops.StoreManifest.readPinned(spark, s"$root/index")
      .filter(col("vec_id") >= 400).count()
    assert(served == newVecs.count(), "append must land every new vector")
  }

  test("the index scan prunes to the probed cells (PartitionFilters on cell)") {
    val root = tmpDir("ivfprune")
    val centroids = Extensions3.trainCentroids(emb, "vec_id", "embedding", k = 8)
    IvfStore.writeIndex(emb, "vec_id", "embedding", centroids, root)
    val queries = emb.filter(col("vec_id") < 3)
    val df = IvfStore.topKFromIndex(
      spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
    df.collect() // force planning + execution
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell#\\d+ IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"index read must partition-prune on cell:\n$plan"))
    // 3 queries x 2 probes can touch at most 6 of the 8 cell directories
    val touched = pf.group(1).split(",").length
    assert(touched <= 6, s"expected <= 6 probed cells in the filter, got $touched")
  }

  test("compaction removes vectors from serving and equals an index built without them") {
    val root = tmpDir("ivfcompact")
    val centroids = Extensions3.trainCentroids(emb, "vec_id", "embedding", k = 8)
    IvfStore.writeIndex(emb, "vec_id", "embedding", centroids, root)
    val queries = emb.filter(col("vec_id") < 10)
    // pick victims OUT of today's top-k so their removal is observable
    val victims = IvfStore.topKFromIndex(
        spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
      .filter(col("rk") === 1).select(col("c_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    val removeVecs = emb.filter(col("vec_id").isin(victims.map(Long.box): _*))
    val touched = IvfStore.compactIndex(removeVecs, "vec_id", "embedding", root)
    assert(touched.nonEmpty && touched.size <= victims.size,
      s"one vector lives in one cell: touched=${touched.size} > victims=${victims.size}")
    val served = IvfStore.topKFromIndex(
        spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    served.foreach { case (_, c, _, _) =>
      assert(!victims.contains(c), s"compacted vector $c still served") }
    // ground truth: an index written WITHOUT the victims serves identically
    val root2 = tmpDir("ivfcompact_truth")
    IvfStore.writeIndex(
      emb.filter(!col("vec_id").isin(victims.map(Long.box): _*)),
      "vec_id", "embedding", centroids, root2)
    val truth = IvfStore.topKFromIndex(
        spark, root2, queries, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(served == truth, "compacted index must equal the never-had-them index")
  }

  test("vacuumStore reclaims superseded quantizer dirs; the pinned version's survive") {
    val root = tmpDir("ivfvacuum")
    val centroids = Extensions3.trainCentroids(emb, "vec_id", "embedding", k = 8)
    IvfStore.writeIndex(emb, "vec_id", "embedding", centroids, root)
    IvfStore.writeIndex(emb, "vec_id", "embedding", centroids, root) // supersedes v1
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def centDirs(): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName).filter(_.startsWith("centroids-")).toSet
    assert(centDirs().size == 2, "each writeIndex lands a fresh quantizer dir")
    val pinnedCent = graft.ops.StoreManifest.meta(spark, s"$root/index")("centroids")
    // inside retention: nothing reclaims (a reader pinned to v1 keeps its
    // quantizers until the clock passes)
    val (f0, s0) = IvfStore.vacuumStore(spark, root)
    assert(f0.isEmpty && s0.isEmpty, "young artifacts must survive default retention")
    assert(centDirs().size == 2)
    // retention passed: the superseded quantizer dir and v1's batch files
    // reclaim; the live version still answers
    val queries = emb.filter(col("vec_id") < 5)
    val before = IvfStore.topKFromIndex(
        spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val (files, sidecars) = IvfStore.vacuumStore(spark, root, retentionMs = 0L)
    assert(files.nonEmpty, "v1's superseded index files must reclaim")
    assert(sidecars.size == 1 && !sidecars.contains(pinnedCent),
      s"exactly the unreferenced quantizer dir reclaims: $sidecars (pinned $pinnedCent)")
    assert(centDirs() == Set(pinnedCent))
    val after = IvfStore.topKFromIndex(
        spark, root, queries, "vec_id", "embedding", k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(after == before, "vacuum must not change a single answer")
  }
}
