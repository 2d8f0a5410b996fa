package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions14

/** Datasheet invariants beyond the value-level oracle. */
class Extensions14Spec extends SparkSpec {

  test("x66 datasheet metrics agree with directly computed corpus facts") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val m = Extensions14.datasheet(d, "text", "source", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == d.count().toDouble)
    assert(m("n_sources") == d.select("source").distinct().count().toDouble)
    assert(m("n_langs") == d.select("lang").distinct().count().toDouble)
    val nTok = d.select(sum(size(split(lower(col("text")), " "))))
      .collect()(0).getLong(0)
    assert(m("n_tokens") == nTok.toDouble)
    assert(m("mean_doc_tokens") > 0 && m("mean_doc_tokens") == 
      math.floor(nTok * 10000.0 / d.count() + 0.5) / 10000.0)
    assert(m("top_lang_share") > 0.0 && m("top_lang_share") <= 1.0)
    assert(m.keySet.size == 8)
  }

  test("x66 datasheet is exactly two corpus passes (round-4 weak closed)") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val (pairs, freq) = Extensions14.datasheetPasses(d, "text", "source", "lang")
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    // each pass reads the corpus exactly once; every datasheet metric
    // derives from these two materialized tables, so total = 2 scans
    assert(scans(pairs) == 1, s"pass 1 must be one corpus scan:\n${pairs.queryExecution.executedPlan}")
    assert(scans(freq) == 1, s"pass 2 must be one corpus scan:\n${freq.queryExecution.executedPlan}")
  }
}
