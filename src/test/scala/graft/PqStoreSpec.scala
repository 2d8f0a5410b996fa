package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions27, Extensions31, PqStore}

/** The persisted IVF-PQ serving path: the written store answers
  * identically to the in-memory x102 operator, the codes scan prunes to
  * probed cells and never reads a raw vector, append lands in
  * stored-geometry cells, and compaction equals an index that never
  * contained the removed vectors.
  */
class PqStoreSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  // 2 Lloyd rounds keeps the suite fast; geometry identical to serving
  private lazy val codebook =
    Extensions27.pqTrain(emb, "vec_id", "embedding", iters = 2)

  private def served(root: String, maxQ: Int = 10): Set[(Long, Long, Long, Long)] =
    PqStore.topKFromIndex(spark, root, emb.filter(col("vec_id") < maxQ),
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("store-served top-k is value-identical to the in-memory ivfPqTopK") {
    val root = tmpDir("pqstore")
    PqStore.writeIndex(emb, "vec_id", "embedding", codebook, root)
    val q = emb.filter(col("vec_id") < 10)
    val fromStore = served(root)
    val inMemory = Extensions31.ivfPqTopK(emb, "vec_id", "embedding", q, codebook)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fromStore == inMemory,
      s"store path diverged: only-store=${fromStore -- inMemory}, only-mem=${inMemory -- fromStore}")
    assert(fromStore.nonEmpty)
  }

  test("codes scan prunes to probed cells (INSET) and reads codes only — no raw vectors") {
    val root = tmpDir("pqprune")
    PqStore.writeIndex(emb, "vec_id", "embedding", codebook, root)
    val df = PqStore.topKFromIndex(spark, root,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell#\\d+ IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"codes read must partition-prune on cell:\n$plan"))
    // 3 queries x 2 probes touch at most 6 of the 8 cell directories
    val touched = pf.group(1).split(",").length
    assert(touched <= 6, s"expected <= 6 probed cells in the filter, got $touched")
    // the serving read is the compressed representation only
    val codesScan = plan.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("/codes"))
      .getOrElse(fail(s"no codes scan found:\n$plan"))
    assert(!codesScan.contains("embedding"),
      s"serving must never read raw vectors: $codesScan")
  }

  test("append encodes against the stored codebook/centroids and is served with the old rows") {
    val root = tmpDir("pqappend")
    val old = emb.filter(col("vec_id") < 400)
    PqStore.writeIndex(old, "vec_id", "embedding", codebook, root)
    PqStore.appendToIndex(emb.filter(col("vec_id") >= 400),
      "vec_id", "embedding", root)
    // coarse seeding (ids 0..7) lives in the old half, so the in-memory
    // operator over the full corpus shares the store's geometry exactly
    val q = emb.filter(col("vec_id") < 5)
    val fromStore = served(root, maxQ = 5)
    val inMemory = Extensions31.ivfPqTopK(emb, "vec_id", "embedding", q, codebook)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fromStore == inMemory, "grown store must equal in-memory over the union")
    val landed = graft.ops.StoreManifest.readPinned(spark, s"$root/codes")
      .filter(col("vec_id") >= 400).select(col("vec_id")).distinct().count()
    assert(landed == emb.filter(col("vec_id") >= 400).count(),
      "append must land every new vector's codes")
  }

  test("compaction removes codes from serving and equals a never-had-them index") {
    val root = tmpDir("pqcompact")
    PqStore.writeIndex(emb, "vec_id", "embedding", codebook, root)
    // victims outside the coarse seed ids (0..7) so the truth rebuild
    // below shares the store's centroid geometry
    val victims = PqStore.topKFromIndex(spark, root,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .filter(col("rk") === 1 && col("c_id") >= 8)
      .select(col("c_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    val removeVecs = emb.filter(col("vec_id").isin(victims.map(Long.box): _*))
    val touched = PqStore.compactIndex(removeVecs, "vec_id", "embedding", root)
    assert(touched.nonEmpty && touched.size <= victims.size,
      s"one vector lives in one cell: touched=${touched.size} > victims=${victims.size}")
    val after = served(root)
    after.foreach { case (_, c, _, _) =>
      assert(!victims.contains(c), s"compacted vector $c still served") }
    val root2 = tmpDir("pqcompact_truth")
    PqStore.writeIndex(
      emb.filter(!col("vec_id").isin(victims.map(Long.box): _*)),
      "vec_id", "embedding", codebook, root2)
    assert(after == served(root2),
      "compacted store must equal the never-had-them store")
  }

  test("x107 fixture recall rows are complete and the store path beats random") {
    val out = SparkEntry.queries("x107_pqstore_recall")(spark, sf0001).collect()
    assert(out.length == 10, "one recall row per query")
    out.foreach { r =>
      assert(r.getLong(1) == 5L, "truth depth is k=5")
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // ADC over 4-bit codes is lossy but must recover a meaningful share
    val mean = out.map(_.getDouble(3)).sum / out.length
    assert(mean > 0.2, s"mean recall@5 must beat noise, got $mean")
  }

  test("probePlan: real measured recalls (ADC is NOT monotone in probes); chosen = smallest probe count at target (or the max when unreachable)") {
    val root = tmpDir("pqprobe")
    PqStore.writeIndex(emb, "vec_id", "embedding", codebook, root)
    val q = emb.filter(col("vec_id") < 10)
    val plan = PqStore.probePlan(spark, root, emb, "vec_id", "embedding", q,
        k = 5, maxProbes = 4, targetRecall = 0.3)
      .collect()
    assert(plan.length == 4)
    val recalls = plan.map(_.getDouble(2))
    // ADC recall can DIP as probes grow (an extra cell's candidates can
    // displace a true neighbor via quantization error) — assert only
    // that every measurement is a real recall, not a monotone fantasy
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    assert(recalls.max > 0.2, s"serving must beat noise: ${recalls.toSeq}")
    val chosen = plan.filter(_.getBoolean(3))
    assert(chosen.length == 1)
    val c = chosen.head
    // smallest probes meeting the target — every earlier row is below it
    if (c.getDouble(2) >= 0.3)
      assert(plan.takeWhile(_.getLong(0) < c.getLong(0))
        .forall(_.getDouble(2) < 0.3), s"not minimal: ${plan.toSeq}")
    else assert(c.getLong(0) == 4L, "unreachable target falls back to max probes")
    // an unreachable target picks the max row
    val strict = PqStore.probePlan(spark, root, emb, "vec_id", "embedding", q,
        k = 5, maxProbes = 3, targetRecall = 1.01)
      .collect()
    assert(strict.filter(_.getBoolean(3)).map(_.getLong(0)).toSeq == Seq(3L))
  }
}
