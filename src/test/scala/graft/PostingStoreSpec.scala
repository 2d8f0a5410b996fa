package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions21, PostingStore}

/** The persisted positional index: store-served phrase search answers
  * identically to the in-memory operator, the scan prunes to the query
  * tokens' buckets, and append grows the same answers.
  */
class PostingStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private val phrase = "batch batch batch"

  private def matches(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("store-served phrase search is value-identical to the in-memory operator") {
    val root = tmpDir("postings")
    PostingStore.write(docs, "doc_id", "text", root)
    val fromStore = matches(PostingStore.phraseSearchFromIndex(spark, root, phrase))
    val inMemory = matches(Extensions21.phraseSearch(docs, "doc_id", "text", phrase))
    assert(fromStore == inMemory && fromStore.nonEmpty,
      s"diverged: only-store=${fromStore -- inMemory}, only-mem=${inMemory -- fromStore}")
  }

  test("postings scan prunes to the query tokens' buckets (INSET partition filter)") {
    val root = tmpDir("postprune")
    PostingStore.write(docs, "doc_id", "text", root, buckets = 64)
    val df = PostingStore.phraseSearchFromIndex(spark, root, "batch stream spark")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*bucket#\\d+ IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"postings read must partition-prune on bucket:\n$plan"))
    // 3 distinct tokens touch at most 3 of the 64 bucket directories
    assert(pf.group(1).split(",").length <= 3,
      s"expected <= 3 pruned buckets: ${pf.group(1)}")
  }

  test("append under the stored modulus: grown store equals a full rewrite over the union") {
    val root = tmpDir("postappend")
    val old = docs.filter(col("doc_id") < 300)
    val more = docs.filter(col("doc_id") >= 300)
    PostingStore.write(old, "doc_id", "text", root, buckets = 32)
    PostingStore.append(more, "doc_id", "text", root)
    val full = tmpDir("postfull")
    PostingStore.write(docs, "doc_id", "text", full, buckets = 32)
    val grown = matches(PostingStore.phraseSearchFromIndex(spark, root, phrase))
    val rebuilt = matches(PostingStore.phraseSearchFromIndex(spark, full, phrase))
    assert(grown == rebuilt && grown.nonEmpty)
  }

  test("x82 oracle-shaped sanity: store matches the declared query's fixture results") {
    val root = tmpDir("postx82")
    PostingStore.write(docs, "doc_id", "text", root)
    val declared = matches(SparkEntry.queries("x82_phrase_search")(spark, sf0001))
    val served = matches(PostingStore.phraseSearchFromIndex(spark, root, phrase))
    assert(served == declared)
  }
}
