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
    val served = spark.read.parquet(s"$root/index")
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
}
