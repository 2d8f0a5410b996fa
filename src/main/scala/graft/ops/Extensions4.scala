package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Fourth extension batch — retrieval and incremental-corpus operators:
  * query-by-document text similarity search (top-k by n-gram Jaccard over
  * the inverted index) and incremental batch-vs-corpus dedup (the shape a
  * continuously-crawled 100 TB corpus actually runs: dedup the new batch
  * against the existing corpus without ever recomputing corpus×corpus).
  *
  * Scale notes: both operators go through the shingle inverted index —
  * only documents sharing an n-gram ever meet, never all-pairs. x29
  * broadcasts the (small) query-side index; x30's batch index is the
  * small side of the key join against the corpus index, and the corpus
  * side is touched once (no corpus self-join anywhere).
  */
object Extensions4 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Query-by-document similarity search: for each query document, the
    * `k` most similar corpus documents by exact n-gram Jaccard. Candidate
    * generation is the inverted-index equi-join (a corpus doc is scored
    * only if it shares at least one shingle with the query); scoring is
    * exact Jaccard over the shared-shingle counts both index sides carry.
    * Jaccard is rounded BEFORE ranking so ulp noise cannot reorder the
    * top-k; ties break by candidate id.
    *
    * At 100 TB: the query set (a retrieval workload, an eval suite, an
    * attribution probe) is small — its index broadcasts, so the corpus
    * index never shuffles: one scan, map-side join, one agg by
    * (q_id, c_id) whose cardinality is bounded by shared-shingle pairs.
    */
  def jaccardTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      k: Int, shingleSize: Int = 5): DataFrame = {
    val ci = Extensions.shingleIndexFastOf(corpus, idCol, textCol, shingleSize)
      .select(col("doc_id").as("c_id"), col("n_sh").as("cn"), col("shk"))
    val qi = Extensions.shingleIndexFastOf(queries, idCol, textCol, shingleSize)
      .select(col("doc_id").as("q_id"), col("n_sh").as("qn"), col("shk"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("jaccard").desc, col("c_id"))
    ci.join(broadcast(qi), Seq("shk"))
      .filter(col("c_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(count(lit(1)).as("shared"), max(col("qn")).as("qn"), max(col("cn")).as("cn"))
      .withColumn("jaccard",
        round(col("shared") / (col("qn") + col("cn") - col("shared")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("jaccard"), col("rk").cast("long").as("rk"))
  }

  /** x29: [[jaccardTopK]] on the documents fixture — docs 0-9 as the
    * query set against the whole corpus, top-3 each, 3-gram shingles
    * (the fixture's synthetic text shares few 5-grams across documents;
    * 3-grams give every query a populated candidate set so the ranking
    * path is actually exercised).
    */
  def x29JaccardTopK(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    jaccardTopK(d, d.filter(col("doc_id") < 10), "doc_id", "text",
        k = 3, shingleSize = 3)
      .orderBy(col("q_id"), col("rk"))
  }

  /** Incremental dedup: judge each NEW-batch document against the
    * EXISTING corpus — keep it iff no corpus document reaches the Jaccard
    * threshold; otherwise report the best-matching corpus survivor
    * (highest Jaccard, ties to lowest id). The decision table carries
    * every batch doc exactly once (`keep` + nullable `dup_of`/`jaccard`),
    * so the caller can anti-join its batch in one step.
    *
    * This is the steady-state shape of a crawled corpus: the expensive
    * corpus×corpus pass ran once historically; each increment then costs
    * batch-index × corpus-index through the inverted index — linear in
    * the batch, never quadratic in the corpus, and the corpus text is
    * scanned exactly once per increment.
    */
  def incrementalDedup(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, shingleSize: Int = 5): DataFrame = {
    val ci = Extensions.shingleIndexFastOf(corpus, idCol, textCol, shingleSize)
      .select(col("doc_id").as("c_id"), col("n_sh").as("cn"), col("shk"))
    val bi = Extensions.shingleIndexFastOf(batch, idCol, textCol, shingleSize)
      .select(col("doc_id").as("b_id"), col("n_sh").as("bn"), col("shk"))
    val w = Window.partitionBy(col("b_id")).orderBy(col("jaccard").desc, col("c_id"))
    val best = ci.join(bi.hint("shuffle_hash"), Seq("shk"))
      .groupBy(col("b_id"), col("c_id"))
      .agg(count(lit(1)).as("shared"), max(col("bn")).as("bn"), max(col("cn")).as("cn"))
      .withColumn("jaccard",
        round(col("shared") / (col("bn") + col("cn") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("b_id"), col("c_id").as("dup_of"), col("jaccard"))
    batch.select(col(idCol).as("b_id"))
      .join(best, Seq("b_id"), "left_outer")
      .select(col("b_id"), col("dup_of").isNull.as("keep"), col("dup_of"), col("jaccard"))
  }

  /** x30: [[incrementalDedup]] on the documents fixture — docs >= 450 as
    * the incoming batch against the < 450 corpus at the x02 threshold.
    */
  def x30IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    incrementalDedup(
        d.filter(col("doc_id") < 450), d.filter(col("doc_id") >= 450),
        "doc_id", "text", threshold = 0.5)
      .orderBy(col("b_id"))
  }

  /** Shared DuckDB shingle CTE prefix (n-gram, distinct-per-doc, with
    * per-doc counts) — the same arithmetic x20's oracle replays.
    */
  private def shingleCtes(n: Int): String = s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      sh0 AS (SELECT doc_id,
                     CASE WHEN len(toks) >= $n THEN array_to_string(toks[i:i+${n - 1}], ' ')
                          ELSE array_to_string(toks, ' ') END AS sh
              FROM d, UNNEST(generate_series(1, CASE WHEN len(toks) >= $n THEN len(toks)-${n - 1} ELSE 1 END)) AS g(i)),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)"""

  val oracles: Map[String, String] = Map(
    "x29_jaccard_topk" -> (shingleCtes(3) + """,
      q AS (SELECT doc_id, sh FROM sh WHERE doc_id < 10),
      hits AS (SELECT q.doc_id AS q_id, c.doc_id AS c_id, count(*) AS shared
               FROM sh c JOIN q ON c.sh = q.sh AND c.doc_id <> q.doc_id
               GROUP BY 1, 2),
      scored AS (SELECT q_id, c_id,
                        round(shared * 1.0 / (cq.n_sh + cc.n_sh - shared), 4) AS jaccard
                 FROM hits
                 JOIN cnt cq ON cq.doc_id = q_id
                 JOIN cnt cc ON cc.doc_id = c_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                           ORDER BY jaccard DESC, c_id) AS rk
                 FROM scored)
      SELECT q_id, c_id, jaccard, rk FROM ranked WHERE rk <= 3
      ORDER BY q_id, rk"""),
    "x30_incremental_dedup" -> (shingleCtes(5) + """,
      hits AS (SELECT b.doc_id AS b_id, c.doc_id AS c_id, count(*) AS shared
               FROM sh c JOIN sh b ON c.sh = b.sh
               WHERE c.doc_id < 450 AND b.doc_id >= 450
               GROUP BY 1, 2),
      scored AS (SELECT b_id, c_id,
                        round(shared * 1.0 / (cb.n_sh + cc.n_sh - shared), 4) AS jaccard
                 FROM hits
                 JOIN cnt cb ON cb.doc_id = b_id
                 JOIN cnt cc ON cc.doc_id = c_id),
      best AS (SELECT *, row_number() OVER (PARTITION BY b_id
                         ORDER BY jaccard DESC, c_id) AS rk
               FROM scored WHERE jaccard >= 0.5)
      SELECT d.doc_id AS b_id,
             best.c_id IS NULL AS keep,
             best.c_id AS dup_of,
             best.jaccard
      FROM documents d
      LEFT JOIN best ON best.b_id = d.doc_id AND best.rk = 1
      WHERE d.doc_id >= 450
      ORDER BY b_id"""))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x29_jaccard_topk" -> (x29JaccardTopK _),
    "x30_incremental_dedup" -> (x30IncrementalDedup _))
}
