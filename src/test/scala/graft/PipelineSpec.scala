package graft

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.model.Tables

/** End-to-end training-data pipeline over the documents fixture, driven
  * entirely through the library facade — the flow a 100 TB corpus-prep job
  * runs, with the invariants each stage must preserve:
  *
  *   raw corpus → exact dedup → near-dup pairs → clusters →
  *   one representative per cluster → stratified sample → quality/token stats
  */
class PipelineSpec extends SparkSpec {

  test("dedup -> cluster -> representative -> sample -> stats composes and shrinks monotonically") {
    val raw = Tables.load(spark, sf0001, "documents")
    val n0 = raw.count()

    // 1. exact dedup (byte-identical copies out)
    val exact = Graft.exactDedup(raw, "doc_id", "text").cache()
    val n1 = exact.count()
    assert(n1 <= n0 && n1 > 0)

    // 2. near-dup pairs over the survivors, then clusters
    val pairs = Graft.jaccardNearDupPairs(exact, "doc_id", "text", threshold = 0.5)
    val clusters = Graft.dupClusters(pairs)

    // 3. keep one representative per near-dup cluster (min doc_id), plus
    //    every doc that is in no cluster at all
    val drop = clusters.filter(col("doc_id") =!= col("component")).select("doc_id")
    val reps = exact.join(drop, Seq("doc_id"), "left_anti").cache()
    val n2 = reps.count()
    assert(n2 <= n1 && n2 > 0)
    // every cluster still has exactly one surviving member
    val survivorsPerCluster = clusters
      .join(reps.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .groupBy("component").count()
    assert(survivorsPerCluster.filter(col("count") =!= 1).count() == 0)
    // and no two surviving docs are still near-dups
    assert(Graft.jaccardNearDupPairs(reps, "doc_id", "text", threshold = 0.5).count() == 0)

    // 4. deterministic stratified sample of the clean corpus
    val sampled = Graft.stratifiedSample(reps, "lang", "doc_id",
      rates = Map("en" -> 0.5), default = 0.8)
    val n3 = sampled.count()
    assert(n3 <= n2 && n3 > 0)

    // 5. downstream stats still run on the final cut (tokens per doc > 0)
    val stats = sampled.select(
      col("doc_id"),
      size(split(lower(col("text")), " ")).as("n_tokens"))
    assert(stats.filter(col("n_tokens") <= 0).count() == 0)

    // the funnel is reported for the record
    info(s"corpus funnel: raw=$n0 -> exact=$n1 -> reps=$n2 -> sampled=$n3")
  }
}
