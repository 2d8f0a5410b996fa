package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** One-hundred-second extension batch — dedup below the word boundary:
  *
  *  - codepoint n-gram Jaccard pairs (x232): the whitespace tokenizer
  *    under every x02-family chain silently collapses on unsegmented
  *    scripts (CJK, Thai, Lao): a spaceless document is ONE token, so
  *    its "5-gram shingle" set is a single whole-text string and
  *    near-dup recall drops to exact-copy-only. The fix real pipelines
  *    ship (CCNet's char-level fallback) is shingling on CODEPOINT
  *    n-grams — script-independent, no segmenter needed — through the
  *    SAME inverted-index pair machinery (never all-pairs).
  *  - script-routed pair union: word shingles where spaces carry the
  *    structure, codepoint grams where they don't, selected per
  *    document by measured space density, pairs unioned — the
  *    per-language selection rule as one operator.
  *
  * Determinism discipline: grams are distinct per doc before the
  * explode (the x02 contract); Jaccard rounds to 4dp before
  * thresholding; pair order is (doc_a < doc_b).
  */
object Extensions102 {

  /** Distinct codepoint `n`-grams of a (already case-folded) text
    * column. Uniform substr semantics — a document shorter than n
    * codepoints contributes its whole text as one gram (substr
    * truncates), exactly replayable as SQL `substr(t, i, n)`.
    *
    * The gram column must be a bound attribute (`t`), not an inline
    * expression: HOF lambdas re-evaluate their free expressions per
    * element (the [[Extensions.shinglesFromToks]] lesson — O(len²)
    * otherwise).
    */
  private[ops] def charGramsOf(t: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n))))

  /** (doc_id, n_sh, shk) inverted-index rows over codepoint n-grams —
    * the [[Extensions.shingleIndexFastOf]] shape with characters as the
    * unit, so the whole pair/cluster/store tail applies unchanged.
    * Empty texts are dropped (an empty gram would pair every empty doc
    * with every other at Jaccard 1).
    *
    * Scale: ~1 gram per codepoint vs ~1 shingle per word — a constant
    * ~5× index-row factor over the word path, same never-all-pairs join
    * geometry; only 8-byte keys shuffle.
    */
  def charGramIndexOf(
      corpus: DataFrame, idCol: String, textCol: String, n: Int = 10,
      gramSampleMod: Int = 1): DataFrame = {
    require(n >= 2, "codepoint grams below 2 are single characters — no context")
    require(gramSampleMod >= 1)
    // winnowing dial: keep only grams whose CONTENT hash ≡ 0 (mod m) —
    // content-keyed (shift-robust, unlike position striding: a 1-char
    // insertion moves every downstream position but no gram's bytes),
    // identical selection on both sides of any pair, and md5-portable
    // so the oracle replays it. Jaccard over the sampled sets is the
    // standard unbiased estimate; index rows AND hot-gram join fan-out
    // both shrink ~m× (the fan-out quadratically where it hurts).
    val sampled =
      if (gramSampleMod == 1) charGramsOf(col("ct"), n)
      else filter(charGramsOf(col("ct"), n), g =>
        pmod(graft.functions.HashFunctions.md5_bucket60(g),
          lit(gramSampleMod.toLong)) === 0L)
    // Materialize the (doc_id, grams) projection BEFORE the explode.
    // Two optimizer behaviors otherwise stack into a single-slot
    // disaster: InferFiltersFromGenerate infers size(grams) > 0 from
    // the explode, and predicate pushdown carries that filter — with
    // the ENTIRE gram expression inlined — through the rebalance
    // exchange onto the unbalanced scan, where it runs once per row on
    // one core (and once more per join side in the pair tail).
    // The checkpoint pins the expensive expression to exactly one
    // 32-wide evaluation; the inferred filter then reads a materialized
    // array column. Measured at sf0.1: 23 s → ~4 s for the x232 chain.
    val gs = Extensions.materialized(
      Extensions.rebalanced(corpus, idCol)
        .select(col(idCol).as("doc_id"), lower(col(textCol)).as("ct"))
        .filter(length(col("ct")) > 0)
        .select(col("doc_id"), sampled.as("gs")))
    gs.select(col("doc_id"), size(col("gs")).as("n_sh"), explode(col("gs")).as("sh"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("sh")).as("shk"))
  }

  /** Exact codepoint-n-gram Jaccard pairs at `threshold` — the x02
    * contract for scripts the word chain cannot see. Output:
    * (doc_a, doc_b, jaccard), doc_a < doc_b. `gramSampleMod` > 1
    * switches to the winnowed estimate (see [[charGramIndexOf]]) — the
    * production dial for corpora where ~1 gram/codepoint is real money.
    *
    * Re-plan (sf1 scaling audit: exponent 1.82 through the full-index
    * bucket self-join): codepoint grams are LOW-cardinality — common
    * substrings recur corpus-wide far more than word shingles do, so
    * hot gram buckets grow with the corpus and the bucket self-join
    * goes quadratic exactly where boilerplate lives. Candidates now
    * come from the x253 lossless prefix filter over the per-doc gram
    * HASH sets (each doc's prefix keeps only its globally-RAREST
    * grams, so a hot gram never seeds a candidate) and verify is a
    * per-candidate array intersection. Threshold equivalence is exact:
    * round4(j) >= T  <=>  the integer prefix bound at (T·10^5 − 5)/10^5
    * — the x232 oracle (full-index replay) still hash-matches.
    * Re-measured exponent after the re-plan: see scaling.json.
    */
  def charGramJaccardPairs(
      corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.4, n: Int = 10, gramSampleMod: Int = 1): DataFrame = {
    val sampled =
      if (gramSampleMod == 1) charGramsOf(col("ct"), n)
      else filter(charGramsOf(col("ct"), n), g =>
        pmod(graft.functions.HashFunctions.md5_bucket60(g),
          lit(gramSampleMod.toLong)) === 0L)
    // the same pre-explode materialization as charGramIndexOf (pins the
    // gram expression to one evaluation); terms travel as 8-byte hashes
    val sets = Extensions.materialized(
      Extensions.rebalanced(corpus, idCol)
        .select(col(idCol).as("doc_id"), lower(col(textCol)).as("ct"))
        .filter(length(col("ct")) > 0)
        .select(col("doc_id"), transform(sampled, g => xxhash64(g)).as("tk"))
        .select(col("doc_id"), col("tk"), size(col("tk")).cast("long").as("sz")))
    val tNum = math.round(threshold * 100000.0) - 5L
    Extensions111.prefixCandidates(sets, tNum, 100000L)
      .join(sets.select(col("doc_id").as("doc_a"), col("tk").as("tka"),
        col("sz").as("na")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("tk").as("tkb"),
        col("sz").as("nb")), Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("tka"), col("tkb"))).cast("long"))
      .withColumn("jaccard",
        Extensions.round4o(col("shared") / (col("na") + col("nb") - col("shared"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Script-routed near-dup pairs: documents whose space share is below
    * `spaceShareMin` (unsegmented scripts — CJK text has essentially no
    * U+0020) take the codepoint path; the rest take the word path; the
    * pair lists union (a cross-route pair cannot arise — the routes
    * partition the corpus, which is the point: a CJK doc and an English
    * doc are not near-dups of each other under either tokenizer).
    *
    * Scale: one corpus scan computes the route flag; each route's chain
    * sees only its slice.
    */
  def scriptRoutedJaccardPairs(
      corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.4, wordShingle: Int = 5, charGram: Int = 10,
      spaceShareMin: Double = 0.05): DataFrame = {
    val routed = Extensions.materialized(
      corpus.select(col(idCol).as("doc_id"), col(textCol).as("t"))
        .filter(length(col("t")) > 0)
        .withColumn("__char_route",
          (length(col("t")) - length(translate(col("t"), " ", ""))).cast("double")
            / length(col("t")) < spaceShareMin))
    val wordPairs = Extensions.jaccardPairs(
      routed.filter(!col("__char_route")), "doc_id", "t", threshold, wordShingle)
    val charPairs = charGramJaccardPairs(
      routed.filter(col("__char_route")), "doc_id", "t", threshold, charGram)
    wordPairs.unionByName(charPairs)
  }

  // ---- x232: codepoint-gram dedup on despaced text ------------------------------

  /** x232: the documents fixture with spaces stripped — every doc
    * becomes an "unsegmented script" stand-in (one giant token), which
    * is exactly the input that collapses the word chain (the spec
    * proves the word path finds only exact copies here) — and the
    * codepoint path must still recover the planted near-dup structure.
    */
  def x232CharGramDedup(s: SparkSession, dir: String): DataFrame =
    charGramJaccardPairs(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), translate(col("text"), " ", "").as("text")),
      "doc_id", "text", gramSampleMod = 4)
      .orderBy(col("doc_a"), col("doc_b"))

  private val x232OracleSql: String = """
      WITH d AS (SELECT doc_id, replace(lower(text), ' ', '') AS t
                 FROM documents WHERE len(replace(lower(text), ' ', '')) > 0),
      g0 AS (SELECT doc_id, substr(t, i, 10) AS g
             FROM d, UNNEST(generate_series(1,
               greatest(len(t) - 9, 1))) AS s(i)),
      g AS (SELECT DISTINCT doc_id, g FROM g0
            WHERE ('0x' || substr(md5(g), 1, 15))::BIGINT % 4 = 0),
      cnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
                FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             round(shared * 1.0 / (ca.n + cb.n - shared), 4) AS jaccard
      FROM pairs
      JOIN cnt ca ON ca.doc_id = pairs.doc_a
      JOIN cnt cb ON cb.doc_id = pairs.doc_b
      WHERE round(shared * 1.0 / (ca.n + cb.n - shared), 4) >= 0.4
      ORDER BY doc_a, doc_b"""

  val oracles: Map[String, String] = Map(
    "x232_chargram_dedup" -> x232OracleSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x232_chargram_dedup" -> (x232CharGramDedup _))
}
