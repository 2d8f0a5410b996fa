package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** One-hundred-sixth extension batch — the split discipline and the
  * embedding-space probe a training pipeline runs before every release:
  *
  *  - LOO kNN-classifier eval (x241): leave-one-out accuracy of a
  *    majority vote over each vector's k nearest cosine neighbors —
  *    the "do my embeddings separate the labels" number. Exact over
  *    the fixture (the broadcast-query brute shape of x05); at corpus
  *    scale the neighbor set comes from the served IVF path
  *    ([[PqStore]]) with identical vote/tie rules.
  *  - split-leakage guard (x243): near-dup pairs that straddle splits
  *    are test-set contamination the doc-level split cannot see. The
  *    guard counts them, then repairs by moving every near-dup
  *    component wholly into one split (the min-id member's) — after
  *    which straddling pairs are ZERO by construction.
  *
  * Determinism discipline: x241 quantizes components to 1e-4 longs so
  * dot/norm products are exact integers (the x237 rule), similarities
  * micro-quantize to 1e-6 before ranking with id ties, votes break
  * ties on (count desc, label asc); x243 rides x60's md5 split (the
  * growth-stable pure-function-of-id assignment, asserted in the spec)
  * and min-id component labels.
  */
object Extensions106 {

  // ---- x241: LOO kNN-classifier eval ---------------------------------------------

  /** Per label: member count, correct majority votes, accuracy under
    * leave-one-out k-NN. Similarity = cosine over 1e-4-quantized
    * components (integer dot/norms; one rounded 1e-6 quantization at
    * the end), neighbors rank (sim desc, id asc), the vote breaks ties
    * (count desc, label asc).
    *
    * Scale: the scored relation is candidates × queries — exact brute
    * here (the eval's truth), IVF-pruned in production serving; the
    * per-query window partitions on the query id (never global), and
    * everything after the top-k is O(n·k).
    */
  def knnClassifierEval(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int = 5, queryMod: Int = 1,
      maxLooQueries: Long = 50000L): DataFrame = {
    require(k >= 1 && queryMod >= 1)
    // The scored relation is candidates × queries, and with a fixed
    // queryMod the query side is a SHARE of the corpus — the sf1 scaling
    // audit measured this shape at exponent 1.89. Enforce the bound
    // instead of trusting the caller (the blockingPlan discipline,
    // Extensions120): refuse loudly above the cap and name the budgeted
    // entry point whose query COUNT stays fixed as the corpus grows.
    val nRows = emb.count()
    val nQueries = nRows / queryMod + 1L
    require(nQueries <= maxLooQueries,
      s"knnClassifierEval would rank ~$nQueries LOO queries against " +
        s"$nRows candidates (queryMod=$queryMod is a SHARE, so the scored " +
        s"relation grows quadratically with the corpus) — that exceeds " +
        s"maxLooQueries=$maxLooQueries; use knnClassifierEvalBudgeted, " +
        "which derives the modulus from a fixed query budget")
    val ql = transform(col(vecCol), x =>
      round(x.cast("double") * lit(1e4), 0).cast("long"))
    // native codegen long dot (one fused loop) — arithmetic identical to
    // the HOF form; the scored relation is where |queries|·|corpus|
    // evaluations live
    def dot(a: String, b: String) =
      graft.functions.VectorFunctions.long_dot(col(a), col(b))
    val base = emb.select(col(idCol).as("id"), col(labelCol).as("label"),
      ql.as("qv"),
      aggregate(transform(ql, x => x * x), lit(0L), _ + _).as("nrm"))
    // the query side is where the quadratic lives: every candidate still
    // scores, but only the 1-in-queryMod deterministic query sample pays
    // the ranking — the standard way a LOO eval prices a 10^9-row corpus
    val q = base.filter(pmod(col("id"), lit(queryMod.toLong)) === 0L)
      .select(col("id").as("q_id"), col("label").as("q_label"),
        col("qv").as("qq"), col("nrm").as("qn"))
    val scored = base.crossJoin(broadcast(q))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("id").as("c_id"),
        col("label").as("c_label"),
        round(lit(1e6) * (dot("qv", "qq").cast("double") /
          (sqrt(col("nrm").cast("double")) * sqrt(col("qn").cast("double")))), 0)
          .cast("long").as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    val votes = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("q_id"), col("q_label"), col("c_label"))
      .agg(count(lit(1)).as("n_votes"))
    val vw = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("c_label"))
    votes.withColumn("vr", row_number().over(vw))
      .filter(col("vr") === 1)
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        Extensions.round4o(col("n_correct") / col("n")).as("accuracy"))
      .orderBy(col("label"))
  }

  /** x241: does 5-NN majority vote recover the fixture labels?
    * Accuracy estimated on the deterministic 1-in-5 query sample (every
    * candidate still scores; only the sampled queries rank).
    */
  def x241KnnEval(s: SparkSession, dir: String): DataFrame =
    knnClassifierEval(Tables.load(s, dir, "embeddings"),
      "vec_id", "embedding", "label", queryMod = 5)

  /** [[knnClassifierEval]] with the query COUNT budgeted instead of the
    * query SHARE: `queryMod` derives as ceil(n / maxQueries), so the
    * scored relation is candidates × (≤ maxQueries) rows — LINEAR in
    * the corpus where a fixed mod stays quadratic (the sf1 scaling
    * audit measured x241 at exponent 1.89; this form measures ~1).
    * Statistically this is the honest way a LOO eval prices a growing
    * corpus: the accuracy estimate's error depends on the query COUNT,
    * not the query share, so holding the count buys linear cost at
    * constant precision.
    */
  def knnClassifierEvalBudgeted(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int = 5, maxQueries: Long = 1000L): DataFrame = {
    require(maxQueries >= 1)
    val n = emb.count()
    val mod = math.max(1L, (n + maxQueries - 1L) / maxQueries).toInt
    // the budget IS the cap here: the derived mod holds the query count
    // at <= maxQueries by construction, so pass that through rather than
    // tripping the share-path guard on a caller-chosen large budget
    knnClassifierEval(emb, idCol, vecCol, labelCol, k, queryMod = mod,
      maxLooQueries = maxQueries + 1L)
  }

  /** x283: the budgeted LOO eval at maxQueries = 250 — the fixture
    * binding of the linear scale path (derived mod: 2 at sf0.01's 500
    * vectors, 8 at sf0.1's 2000, 80 at the synthesized sf1's 20000 —
    * the query count stays ≤ 250 while x241's fixed 1-in-5 share grows
    * with the corpus).
    */
  def x283KnnEvalBudgeted(s: SparkSession, dir: String): DataFrame =
    knnClassifierEvalBudgeted(Tables.load(s, dir, "embeddings"),
      "vec_id", "embedding", "label", maxQueries = 250L)

  private val x241OracleSql: String = """
      WITH base AS (
        SELECT vec_id AS id, label,
               list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1e4, 0)) AS qv
        FROM embeddings),
      nrm AS (SELECT id, label, qv, list_dot_product(qv, qv) AS nrm FROM base),
      scored AS (
        SELECT q.id AS q_id, q.label AS q_label, c.id AS c_id, c.label AS c_label,
               CAST(round(1e6 * (list_dot_product(c.qv, q.qv)
                 / (sqrt(c.nrm) * sqrt(q.nrm))), 0) AS BIGINT) AS sim
        FROM nrm c CROSS JOIN nrm q WHERE c.id <> q.id AND q.id % 5 = 0),
      topk AS (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rk
        FROM scored),
      votes AS (
        SELECT q_id, q_label, c_label, count(*) AS n_votes
        FROM topk WHERE rk <= 5 GROUP BY 1, 2, 3),
      win AS (
        SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY n_votes DESC, c_label) AS vr
        FROM votes)
      SELECT q_label AS label, count(*) AS n,
             CAST(sum(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
             round(sum(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) * 10000.0
               / count(*), 0) / 10000.0 AS accuracy
      FROM win WHERE vr = 1
      GROUP BY q_label ORDER BY q_label"""

  // ---- x243: split-leakage guard -------------------------------------------------

  /** Near-dup leakage across a split: pairs at `threshold` whose ends
    * landed in different splits, and the repair — every near-dup
    * component moves wholly into the split of its min-id member.
    * Returns one summary row: pairs, leaky pairs before, docs moved,
    * leaky pairs after (zero by construction, computed not asserted).
    *
    * [[Extensions19.clusterSafeSplit]] is the CONSTRUCTIVE counterpart
    * (split assigned cluster-safe from the start); this is the guard +
    * repair for a split that already exists — the common production
    * case, where the split predates the dedup run that found the pairs.
    *
    * Scale: the pair chain is the x02 inverted index (never all-pairs);
    * components are pair-graph-sized; the repair is two equi-joins of
    * the component table (corpus-broadcastable — components exist only
    * where dups do).
    */
  def splitLeakage(
      corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val assigned = Extensions11.stratifiedSplit(corpus, idCol)
      .select(col(idCol).as("doc_id"), col("split"))
    val pairs = Extensions.materialized(
      Extensions.jaccardPairs(corpus, idCol, textCol, threshold)
        .select(col("doc_a"), col("doc_b")))
    val withSplits = pairs
      .join(assigned.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(assigned.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
    val comp = Extensions2.connectedComponents(pairs, "doc_a", "doc_b")
    val repaired = assigned.join(comp, Seq("doc_id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val repSplit = repaired.filter(col("doc_id") === col("component"))
      .select(col("component"), col("split").as("rep_split"))
    val after = repaired.join(broadcast(repSplit), Seq("component"))
      .select(col("doc_id"), col("rep_split").as("split"))
    val afterLeaks = pairs
      .join(after.select(col("doc_id").as("doc_a"), col("split").as("sa2")),
        Seq("doc_a"))
      .join(after.select(col("doc_id").as("doc_b"), col("split").as("sb2")),
        Seq("doc_b"))
      .filter(col("sa2") =!= col("sb2"))
    val moved = repaired.join(broadcast(repSplit), Seq("component"))
      .filter(col("split") =!= col("rep_split"))
    withSplits.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
          .as("n_leaky_before"))
      .crossJoin(moved.agg(count(lit(1)).as("n_docs_moved")))
      .crossJoin(afterLeaks.agg(count(lit(1)).as("n_leaky_after")))
  }

  /** x243: leakage of the fixture's near-dups across the x60 split. */
  def x243SplitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakage(Tables.load(s, dir, "documents"), "doc_id", "text")

  private val x243OracleSql: String = """
      WITH RECURSIVE
      a AS (
        SELECT doc_id,
               CASE WHEN b < 50 THEN 'val' WHEN b < 100 THEN 'test'
                    ELSE 'train' END AS split
        FROM (SELECT doc_id,
                ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT
                  % 1000 AS b
              FROM documents)),
      d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
              FROM d, UNNEST(generate_series(1,
                CASE WHEN len(toks) >= 5 THEN len(toks) - 4 ELSE 1 END)) AS g(i)),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      jp AS (SELECT doc_a, doc_b FROM prs
             JOIN cnt ca ON ca.doc_id = doc_a
             JOIN cnt cb ON cb.doc_id = doc_b
             WHERE round(shared * 1.0 / (ca.n_sh + cb.n_sh - shared), 4) >= 0.5),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
                UNION ALL SELECT doc_b, doc_a FROM jp),
      reach(node, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
      cc AS (SELECT node AS doc_id, min(comp) AS component FROM reach GROUP BY node),
      rep AS (SELECT a.doc_id, coalesce(cc.component, a.doc_id) AS component, a.split
              FROM a LEFT JOIN cc ON cc.doc_id = a.doc_id),
      rsplit AS (SELECT component, split AS rep_split FROM rep
                 WHERE doc_id = component),
      aft AS (SELECT rep.doc_id, rsplit.rep_split AS split
              FROM rep JOIN rsplit ON rsplit.component = rep.component),
      before_t AS (
        SELECT count(*) AS n_pairs,
               CAST(sum(CASE WHEN pa.split <> pb.split THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_leaky_before
        FROM jp JOIN a pa ON pa.doc_id = jp.doc_a
                JOIN a pb ON pb.doc_id = jp.doc_b),
      moved_t AS (
        SELECT count(*) AS n_docs_moved
        FROM rep JOIN rsplit ON rsplit.component = rep.component
        WHERE rep.split <> rsplit.rep_split),
      after_t AS (
        SELECT count(*) AS n_leaky_after
        FROM jp JOIN aft qa ON qa.doc_id = jp.doc_a
                JOIN aft qb ON qb.doc_id = jp.doc_b
        WHERE qa.split <> qb.split)
      SELECT n_pairs, n_leaky_before, n_docs_moved, n_leaky_after
      FROM before_t CROSS JOIN moved_t CROSS JOIN after_t"""

  /** x283's oracle is x241's with the fixed 1-in-5 sample replaced by
    * the same derived ceil(n/1000) modulus — the oracle computes the
    * budget from its own count, exactly as the engine does.
    */
  private val x283OracleSql: String = {
    val derived = x241OracleSql.replace(
      "q.id % 5 = 0",
      "q.id % greatest((SELECT (count(*) + 249) // 250 FROM base), 1) = 0")
    // String-replace derivation fails SILENTLY if x241's predicate text
    // ever drifts — the replace no-ops and x283's oracle reverts to the
    // 1-in-5 sample, surfacing later as a confusing hash mismatch.
    // Fail at construction instead (round-11 advice).
    require(derived != x241OracleSql,
      "x283 oracle derivation no-op'd: the 'q.id % 5 = 0' predicate " +
        "drifted in x241OracleSql — update the replace target")
    derived
  }

  val oracles: Map[String, String] = Map(
    "x241_knn_eval" -> x241OracleSql,
    "x243_split_leakage" -> x243OracleSql,
    "x283_knn_eval_budgeted" -> x283OracleSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x241_knn_eval" -> (x241KnnEval _),
    "x243_split_leakage" -> (x243SplitLeakage _),
    "x283_knn_eval_budgeted" -> (x283KnnEvalBudgeted _))
}
