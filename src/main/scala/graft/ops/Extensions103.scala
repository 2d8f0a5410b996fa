package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** One-hundred-third extension batch — the sampler and the asymmetric
  * dup signal:
  *
  *  - deterministic weighted priority sample (x233): the
  *    Efraimidis–Spirakis A-ES scheme (key = u^(1/w), keep top-k) with
  *    the randomness replaced by a hash-uniform — the mixture builder's
  *    workhorse when "sample 10M docs, longer docs proportionally more
  *    likely" must be REPRODUCIBLE across runs, retries, and engines.
  *  - containment pairs (x234): Jaccard misses the quote-inclusion
  *    case by construction — a 50-shingle doc wholly contained in a
  *    5000-shingle doc has J ≈ 0.01 but containment 1.0. Real corpus
  *    dedup (news wire in aggregator pages, license boilerplate around
  *    code) keys on C = shared/min(na, nb); this surfaces exactly the
  *    pairs the x02 chain is blind to.
  *
  * Determinism discipline: the sample key is micro-quantized (×1e6,
  * half-away long) BEFORE ranking with doc_id ties (the x129 rule —
  * libm ulps cannot flip a rank); containment rounds to 4dp before
  * thresholding (the x02 contract).
  */
object Extensions103 {

  // ---- x233: deterministic weighted priority sample -----------------------------

  /** Top-`k` weighted priority sample: per row, u = (h + 1) / 2^20 with
    * h = md5_bucket60(id) mod 2^20 (hash-uniform in (0, 1], portable —
    * the md5 arithmetic replays bit-for-bit in SQL), priority
    * = ln(u) / w (monotone in u^(1/w)), micro-quantized to 1e-6 and
    * ranked descending with id ties. Heavier weights pull the priority
    * toward 0 (= u^(1/w) toward 1), so P(selected) grows with w — the
    * A-ES property — while every run, every engine, and every retry
    * draws the SAME sample.
    *
    * Scale: one narrow projection + a global top-k
    * (TakeOrderedAndProject — per-partition heaps, driver merges k
    * rows; no global sort).
    */
  def weightedSample(
      corpus: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val m = 1L << 20
    val h = pmod(graft.functions.HashFunctions.md5_bucket60(
      col(idCol).cast("string")), lit(m))
    val u = (h + lit(1L)).cast("double") / lit(m.toDouble)
    corpus
      .filter(col(weightCol) > 0)
      .withColumn("priority",
        round(lit(1e6) * log(u) / col(weightCol), 0).cast("long"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** x233: 50 docs sampled ∝ length from the fixture corpus. */
  def x233WeightedSample(s: SparkSession, dir: String): DataFrame =
    weightedSample(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars")),
      "doc_id", "n_chars", 50)
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority"))
      .orderBy(col("doc_id"))

  private val x233OracleSql: String = """
      WITH keyed AS (
        SELECT doc_id, source, n_chars,
               CAST(round(1e6 * ln(
                   (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                     % 1048576 + 1) / 1048576.0)
                 / n_chars, 0) AS BIGINT) AS priority
        FROM documents WHERE n_chars > 0),
      top AS (SELECT * FROM keyed ORDER BY priority DESC, doc_id LIMIT 50)
      SELECT doc_id, source, n_chars, priority FROM top ORDER BY doc_id"""

  // ---- x234: containment pairs --------------------------------------------------

  /** Shingle-containment pairs: C = shared / min(na, nb) ≥ `threshold`,
    * output (doc_a, doc_b, jaccard, containment), doc_a < doc_b — the
    * asymmetric dup verdict for doc-inside-doc. Same inverted-index
    * join geometry as the x02 chain (never all-pairs); only the final
    * ratio differs, which is the point: the output is exactly the pair
    * set Jaccard under-scores.
    *
    * Scale: identical to [[Extensions.jaccardPairs]] — candidate volume
    * tracks shared shingles, 8-byte keys shuffle.
    */
  def containmentPairs(
      corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.9, shingleSize: Int = 5): DataFrame = {
    val sh = Extensions.shingleIndexFastOf(corpus, idCol, textCol, shingleSize)
    sh.as("x").join(sh.as("y").hint("shuffle_hash"),
        col("x.shk") === col("y.shk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        Extensions.round4o(col("shared") / (col("na") + col("nb") - col("shared")))
          .as("jaccard"),
        Extensions.round4o(col("shared") / least(col("na"), col("nb")))
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** x234: plant doc-inside-doc cases the Jaccard chain under-scores —
    * every 25th doc's text embedded inside its neighbor's — and surface
    * them by containment.
    */
  def x234ContainmentPairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val host = d.filter(pmod(col("doc_id"), lit(25L)) === 0L)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("prefix commentary before the quoted material "),
          col("text"), lit(" and trailing analysis after the quote ends")).as("text"))
    containmentPairs(
      d.select(col("doc_id"), col("text")).unionByName(host),
      "doc_id", "text", threshold = 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val x234OracleSql: String = """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000,
               'prefix commentary before the quoted material ' || text ||
               ' and trailing analysis after the quote ends'
        FROM documents WHERE doc_id % 25 = 0),
      d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM base),
      sh0 AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
              FROM d, UNNEST(generate_series(1,
                CASE WHEN len(toks) >= 5 THEN len(toks) - 4 ELSE 1 END)) AS g(i)),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             round(shared * 1.0 / (ca.n_sh + cb.n_sh - shared), 4) AS jaccard,
             round(shared * 1.0 / least(ca.n_sh, cb.n_sh), 4) AS containment
      FROM prs
      JOIN cnt ca ON ca.doc_id = prs.doc_a
      JOIN cnt cb ON cb.doc_id = prs.doc_b
      WHERE round(shared * 1.0 / least(ca.n_sh, cb.n_sh), 4) >= 0.8
      ORDER BY doc_a, doc_b"""

  val oracles: Map[String, String] = Map(
    "x233_weighted_sample" -> x233OracleSql,
    "x234_containment_pairs" -> x234OracleSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x233_weighted_sample" -> (x233WeightedSample _),
    "x234_containment_pairs" -> (x234ContainmentPairs _))
}
