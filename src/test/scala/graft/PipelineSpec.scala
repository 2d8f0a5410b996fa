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

  test("hygiene -> cap -> mix -> pack: the round-3 stages compose into the full prep flow") {
    val raw = Tables.load(spark, sf0001, "documents")
    val n0 = raw.count()

    // 1. repetition hygiene: drop boilerplate-heavy docs (fixture docs are
    //    synthetic-clean, so assert the gate passes rather than bites)
    val metrics = Graft.repetitionMetrics(raw, "doc_id", "text")
    val clean = raw.join(
      metrics.filter(col("dup_5gram_frac") < 0.5 && col("top_2gram_frac") < 0.5)
        .select("doc_id"),
      Seq("doc_id"), "left_semi").cache()
    val n1 = clean.count()
    assert(n1 <= n0 && n1 > 0)

    // 2. cross-doc duplication signal exists for every surviving doc
    val cov = Graft.dupGramCoverage(clean, "doc_id", "text")
    assert(cov.count() == n1)
    assert(cov.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)

    // 3. domain capping, then temperature mixing over the capped corpus
    val capped = Graft.domainCap(clean, "source", "n_chars", "doc_id", cap = 10)
    val n2 = capped.count()
    assert(n2 <= n1 && n2 > 0)
    val mixed = Graft.temperatureMix(capped.drop("rk"), "lang", "doc_id",
      alpha = 0.5, targetRows = n2 / 2)
    val n3 = mixed.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. pack the final cut into 256-token chunks per language; packing
    //    must conserve every token of its input
    val packed = Graft.packSequences(mixed, "lang", "doc_id", "text", budget = 256)
    val packedTokens = packed.agg(sum(col("chunk_tokens"))).collect()(0).getLong(0)
    val inputTokens = mixed.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(packedTokens == inputTokens,
      s"packing must conserve tokens: $packedTokens vs $inputTokens")
    assert(packed.filter(col("n_docs") <= 0).count() == 0)

    info(s"prep funnel: raw=$n0 -> clean=$n1 -> capped=$n2 -> mixed=$n3 " +
      s"-> ${packed.count()} chunks / $packedTokens tokens")
  }
}
