package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions4, Extensions15}

/** Signature-store dedup invariants (x67). */
class Extensions15Spec extends SparkSpec {

  test("x67 signature verdicts agree with exact-verify incrementalDedup on planted dups") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact copy
      (11L, "completely different text with no overlap whatsoever at all")
    ).toDF("doc_id", "text")
    val sigs = Extensions15.incrementalSignatureDedup(
        Extensions15.minhashSignatures(corpus, "doc_id", "text"),
        Extensions15.minhashSignatures(batch, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val exact = Extensions4.incrementalDedup(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(sigs == exact, s"signature path $sigs diverged from exact path $exact")
    assert(sigs(10L) == (false, 1L), "the exact copy must be dropped, mapped to doc 1")
    assert(sigs(11L) == (true, -1L), "the novel doc must be kept")
  }

  test("x67 corpus side never touches text after signing (signatures are self-sufficient)") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val cs = Extensions15.minhashSignatures(
      d.filter(col("doc_id") < 400), "doc_id", "text").cache()
    cs.count() // materialize the store
    val bs = Extensions15.minhashSignatures(
      d.filter(col("doc_id") >= 400), "doc_id", "text")
    val plan = Extensions15.incrementalSignatureDedup(cs, bs)
      .queryExecution.executedPlan.toString
    // exactly the batch-side scans may appear; the cached corpus store
    // must serve from memory (InMemoryTableScan), proving text-free reuse
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"corpus signatures must come from the store, not recompute:\n$plan")
    cs.unpersist()
  }
}
