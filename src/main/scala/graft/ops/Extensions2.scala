package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Second extensions batch for the training-data pipeline surface:
  * IVF-style ANN with precomputed coarse centroids, deterministic
  * stratified sampling, and near-duplicate clustering (connected
  * components over the verified Jaccard pair graph).
  *
  * Scale shapes:
  *  - IVF: the centroid table is tiny (k rows) and BROADCAST to assign
  *    every vector to its nearest cell in one narrow pass; search probes
  *    only the query's best cells (cells ≈ k buckets ⇒ candidate set is
  *    ~probes/k of the corpus, the classic IVF trade);
  *  - stratified sampling uses a deterministic per-key hash threshold, not
  *    an RNG — reproducible across retries/partitionings, no seed plumbing;
  *  - connected components run label propagation to a fixpoint: per
  *    iteration one join + one min-agg (both on the component-graph, which
  *    is MUCH smaller than the corpus: only docs appearing in near-dup
  *    pairs), converging in O(log n) rounds like GraphX/Pregel CC.
  */
object Extensions2 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // ---- X16: IVF ANN (coarse quantizer + cell probe) ------------------------

  private[ops] val IvfCells = 8
  private[ops] val IvfProbes = 2
  private[ops] val AnnK = 5

  /** Codegen'd native expression (graft.functions.CosineSimilarity) — same
    * arithmetic as the HOF formulation in [[Extensions.cosineHof]], ~one
    * fused loop per row instead of interpreted lambda calls.
    */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  /** IVF (inverted-file) ANN with a deterministic coarse quantizer: the
    * first k vectors (vec_id < k) act as cell centroids — the stand-in for
    * k-means centroids that keeps the whole pipeline value-reproducible.
    * Every vector is assigned to its nearest centroid (broadcast join,
    * narrow); each query probes its best `IvfProbes` cells and ranks only
    * those cells' members by exact cosine. Similarities are rounded BEFORE
    * ranking so ulp noise cannot reorder the top-k.
    */
  /** IVF ANN over any corpus of (id, vector). `centroids` is the coarse
    * quantizer table (cell, cvec) — precomputed (k-means offline, or any
    * deterministic pick); it is tiny and broadcast everywhere. Each query
    * probes its `probes` best cells and reranks those cells' members by
    * exact cosine. Output: (q_id, c_id, sim, rk), rk <= k, sims rounded
    * BEFORE ranking so ulp noise cannot reorder the top-k.
    */
  /** Nearest-centroid cell assignment: argmax_cell cos(v, centroid), ties
    * broken by cell id. min_by on the (−csim, cell) struct ≡ the
    * "csim desc, cell asc" row_number rank-1 — but it partial-aggregates
    * map-side: only one row per vector per partition crosses the wire,
    * where the window form shuffled and sorted the full n×k expansion
    * (at 100 TB that window was the dominant cost of the whole IVF path).
    * The tiebreak column makes the ordering struct unique per candidate,
    * so the argmax is deterministic. `base` is (vec_id, embedding);
    * `cents` is the broadcast (cell, cvec) table.
    */
  private[graft] def assignCells(base: DataFrame, cents: DataFrame): DataFrame =
    base.join(cents)
      .withColumn("csim", round(cosine(col("embedding"), col("cvec")), 6))
      .groupBy(col("vec_id"))
      .agg(min_by(
        struct(col("cell"), col("embedding")),
        struct(negate(col("csim")), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cell").as("cell"))

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, probes: Int): DataFrame = {
    val base = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val cents = broadcast(centroids.select(col("cell"), col("cvec")))
    val assigned = assignCells(base, cents)
    // queries probe their `probes` best cells
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probed = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qvec"))
      .join(cents)
      .withColumn("csim", round(cosine(col("qvec"), col("cvec")), 6))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= probes)
      .select(col("q_id"), col("qvec"), col("cell"))
    // search only the probed cells
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    probed.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        round(cosine(col("qvec"), col("embedding")), 4).as("sim"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("sim"), col("rk").cast("long").as("rk"))
  }

  def x16IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val base = emb(s, dir).select(col("vec_id"), col("embedding"))
    // deterministic stand-in for offline k-means centroids: first k vectors
    val cents = base.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    ivfTopK(base, base.filter(col("vec_id") < 10), cents,
        "vec_id", "embedding", k = AnnK, probes = IvfProbes)
      .orderBy(col("q_id"), col("rk"))
  }

  // ---- X17: deterministic stratified sampling ------------------------------

  /** Stratified sample with per-stratum rates (en 20%, other langs 50%),
    * selected by md5-hash threshold on doc_id — a reproducible systematic
    * sample: no RNG state, stable under retries, re-partitioning, and
    * engine choice, which is what a 100 TB pipeline actually wants from
    * `sampleBy`.
    */
  /** Deterministic stratified sample over any DataFrame: keep a row iff its
    * key's md5-bucket (0..999) falls under the stratum's rate. `rates` maps
    * stratum value → sampling fraction; unlisted strata use `default`.
    */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, keyCol: String,
      rates: Map[String, Double], default: Double): DataFrame = {
    val bucket = graft.functions.HashFunctions.md5_bucket60(col(keyCol).cast("string")) % 1000
    val keep = rates.foldLeft(when(lit(false), lit(true))) { case (acc, (stratum, rate)) =>
      acc.when(col(stratumCol) === stratum, bucket < (rate * 1000).toLong)
    }.otherwise(bucket < (default * 1000).toLong)
    df.filter(keep)
  }

  def x17StratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(docs(s, dir), "lang", "doc_id",
        rates = Map("en" -> 0.2), default = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  // ---- X18: near-dup clusters (connected components) -----------------------

  /** Connected components over any undirected pair list: returns
    * (doc_id, component) where component = min id reachable — applied to
    * x02's verified Jaccard pairs this is the canonical "keep one
    * representative per duplicate cluster" step after near-dup detection.
    * Min-label propagation to a fixpoint; each round is one equi-join +
    * min-agg on the pair graph only (not the corpus), and the iteration
    * count is bounded by the graph diameter (near-dup clusters are shallow
    * in practice).
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      driverMaxEdges: Long = 1L << 22): DataFrame = {
    // mirror each pair into both directions INSIDE one plan (explode of a
    // 2-struct array) and materialize once — a union of two projections of
    // the same plan would run the expensive pair-generation subtree twice,
    // and a second checkpoint would pay a second job
    val edgesRaw = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val edgesAll = Extensions.materialized(edgesRaw) // rounds read blocks, not lineage
    val nEdges = edgesAll.count()
    // Size-gated algorithm selection (the AQE philosophy applied to the
    // operator): the pair graph is the OUTPUT of near-dup verification —
    // orders of magnitude smaller than the corpus (~1e-3 of candidate
    // pairs here). Below the threshold (default 4M edges ≈ 64 MB) a
    // driver-side union-find replaces O(diameter) distributed rounds with
    // one job; above it, min-label propagation runs fully distributed.
    if (nEdges <= driverMaxEdges) return ccUnionFind(edgesAll)
    // the distributed path sizes the iteration's parallelism to the GRAPH,
    // not the corpus — ~100k edges per partition keeps every propagation
    // round a handful of tasks instead of full-width shuffles
    val parts = math.max(1L, math.min(32L, nEdges / 100000L)).toInt
    val edges = edgesAll.coalesce(parts)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
    var changed = 1L
    var rounds = 0
    // min-label propagation + pointer doubling: after the neighbor step,
    // each node also adopts its label's label (comp := comp(comp)), so
    // label chains halve every round and convergence is O(log diameter)
    // instead of O(diameter) — a 50-round cap silently returned WRONG
    // components on any graph deeper than 50; 64 doubling rounds cover any
    // representable diameter, and running out is now an error, not a result
    while (changed > 0 && rounds < 64) {
      // candidate label per node: min over neighbors' labels and its own
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("comp"))
      // materialized for three reasons: the doubling step below reads it
      // twice (else the groupBy runs twice), a self-join of the in-plan
      // union trips Catalyst's constraint rewrite, and lineage must not
      // grow across rounds
      val stepped = Extensions.materialized(labels.union(viaNeighbors)
        .groupBy(col("node")).agg(min(col("comp")).as("comp")))
      val next = stepped.as("a")
        .join(stepped.select(col("node").as("cnode"), col("comp").as("ccomp")).as("b"),
          col("a.comp") === col("b.cnode"), "left")
        .select(col("a.node").as("node"),
          least(col("a.comp"), coalesce(col("b.ccomp"), col("a.comp"))).as("comp"))
      changed = next.withColumnRenamed("comp", "comp_next")
        .join(labels.withColumnRenamed("comp", "comp_prev"), Seq("node"))
        .filter(col("comp_next") =!= col("comp_prev")).count()
      labels = next
      rounds += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge after $rounds pointer-doubling rounds " +
        s"($changed labels still moving) — refusing to return wrong components")
    labels.select(col("node").as("doc_id"), col("comp").as("component"))
  }

  /** Driver-side union-find over a small edge list; component label = min
    * node id (identical contract to the distributed path — ApiSpec asserts
    * the two agree on the same graph).
    */
  private def ccUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min id wins
    }
    val out = parent.keys.toSeq.sorted.map(n => (n, find(n)))
    spark.createDataset(out).toDF("doc_id", "component")
  }

  def x18DupClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(
        Extensions.x02JaccardPairs(s, dir).select(col("doc_a"), col("doc_b")),
        "doc_a", "doc_b")
      .orderBy(col("doc_id"))

  // ---- X20: train/eval contamination check ---------------------------------

  /** Benchmark-contamination detection: for every training document, the
    * highest shingle-overlap ratio against any eval-set document; flagged
    * when >= 30% of the training doc's shingles appear in one eval doc.
    * The join goes through the shingle inverted index (only docs sharing a
    * shingle meet — never train × eval), the standard decontamination
    * shape for a 100 TB corpus against a fixed eval suite. Eval set here:
    * doc_id < 50 (the driver fixture has no second corpus; the operator is
    * corpus-agnostic via [[contaminationPairs]]).
    */
  def contaminationPairs(
      train: DataFrame, eval_ : DataFrame, idCol: String, textCol: String,
      minOverlap: Double): DataFrame = {
    val ti = Extensions.shingleIndexFastOf(train, idCol, textCol)
      .select(col("doc_id").as("train_id"), col("n_sh"), col("shk"))
    val ei = Extensions.shingleIndexFastOf(eval_, idCol, textCol)
      .select(col("doc_id").as("eval_id"), col("shk"))
    val w = Window.partitionBy(col("train_id"))
      .orderBy(col("overlap").desc, col("eval_id"))
    ti.join(ei, Seq("shk"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"), max(col("n_sh")).as("n_sh"))
      .withColumn("overlap", Extensions.round4o(col("shared") / col("n_sh")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("overlap") >= minOverlap)
      .select(col("train_id"), col("eval_id").as("matched_eval_id"), col("overlap"))
  }

  def x20Contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    contaminationPairs(
        d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
        "doc_id", "text", minOverlap = 0.3)
      .orderBy(col("train_id"))
  }

  // ---- X21: vocabulary masking ---------------------------------------------

  /** Map-only token masking (the redaction/scrub stage shape: PII regexes
    * swap in for the vocabulary pattern with identical plumbing). Word-
    * boundary regex, replace-all; reports the mask count per document.
    */
  def x21TermMask(s: SparkSession, dir: String): DataFrame = {
    val pattern = "\\b(customer|key)\\b"
    docs(s, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(pattern)).cast("long").as("n_masked"),
        length(regexp_replace(col("text"), pattern, "<MASK>")).cast("long").as("masked_len"),
        substring(regexp_replace(col("text"), pattern, "<MASK>"), 1, 40).as("masked_head"))
      .orderBy(col("doc_id"))
  }

  // ---- X19: approximate quantiles (KLL-style sketch vs exact) --------------

  /** Approximate median per cohort via Spark's percentile_approx sketch.
    * Like x12, the sketch value is engine-specific, so the oracle checks a
    * PROPERTY: the estimate must land within max(2%, 0.5) of the exact
    * interpolated median, which itself is value-checked against DuckDB's
    * quantile_cont.
    */
  def x19ApproxQuantile(s: SparkSession, dir: String): DataFrame =
    graft.model.Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 2).as("exact_median"),
        expr("approx_percentile(value, 0.5, 10000)").as("am"))
      .select(
        col("event_type"),
        col("exact_median"),
        (abs(col("am") - col("exact_median")) <=
          greatest(col("exact_median") * 0.02, lit(0.5))).as("approx_ok"))
      .orderBy(col("event_type"))

  // ---- oracles -------------------------------------------------------------

  val oracles: Map[String, String] = Map(
    "x20_contamination" -> """
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
              FROM d, UNNEST(generate_series(1, CASE WHEN len(toks) >= 5 THEN len(toks)-4 ELSE 1 END)) AS g(i)),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      hits AS (SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS shared
               FROM sh t JOIN sh e ON t.sh = e.sh
               WHERE t.doc_id >= 50 AND e.doc_id < 50
               GROUP BY 1, 2),
      scored AS (SELECT train_id, eval_id,
                        round(shared * 1.0 / cnt.n_sh, 4) AS overlap
                 FROM hits JOIN cnt ON cnt.doc_id = train_id),
      best AS (SELECT *, row_number() OVER (PARTITION BY train_id
                        ORDER BY overlap DESC, eval_id) AS rk
               FROM scored)
      SELECT train_id, eval_id AS matched_eval_id, overlap
      FROM best WHERE rk = 1 AND overlap >= 0.3
      ORDER BY train_id""",
    "x21_term_mask" -> """
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\b(customer|key)\b')) AS BIGINT) AS n_masked,
             CAST(length(regexp_replace(text, '\b(customer|key)\b', '<MASK>', 'g')) AS BIGINT) AS masked_len,
             substring(regexp_replace(text, '\b(customer|key)\b', '<MASK>', 'g'), 1, 40) AS masked_head
      FROM documents
      ORDER BY doc_id""",
    "x19_approx_quantile" -> """
      SELECT event_type,
             round(quantile_cont(value, 0.5), 2) AS exact_median,
             TRUE AS approx_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    "x16_ivf_ann" -> s"""
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cents AS (SELECT vec_id AS cell, v AS cvec FROM base WHERE vec_id < $IvfCells),
      assigned AS (
        SELECT vec_id, v, cell FROM (
          SELECT b.vec_id, b.v, c.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY round(list_cosine_similarity(b.v, c.cvec), 6) DESC, c.cell) AS rk
          FROM base b CROSS JOIN cents c) sub
        WHERE rk = 1),
      probes AS (
        SELECT q_id, qv, cell FROM (
          SELECT b.vec_id AS q_id, b.v AS qv, c.cell,
                 row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY round(list_cosine_similarity(b.v, c.cvec), 6) DESC, c.cell) AS rk
          FROM base b CROSS JOIN cents c
          WHERE b.vec_id < 10) sub
        WHERE rk <= $IvfProbes),
      scored AS (
        SELECT p.q_id, a.vec_id AS c_id,
               round(list_cosine_similarity(p.qv, a.v), 4) AS sim
        FROM probes p JOIN assigned a ON p.cell = a.cell
        WHERE a.vec_id <> p.q_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rk
        FROM scored)
      SELECT q_id, c_id, sim, CAST(rk AS BIGINT) AS rk
      FROM ranked WHERE rk <= $AnnK
      ORDER BY q_id, rk""",
    "x17_stratified_sample" -> """
      SELECT doc_id, lang, source
      FROM (SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS bucket
            FROM documents)
      WHERE CASE WHEN lang = 'en' THEN bucket < 200 ELSE bucket < 500 END
      ORDER BY doc_id""",
    "x18_dup_clusters" -> """
      WITH RECURSIVE
      d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
              FROM d, UNNEST(generate_series(1, CASE WHEN len(toks) >= 5 THEN len(toks)-4 ELSE 1 END)) AS g(i)),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      jpairs AS (SELECT doc_a, doc_b
                 FROM pairs
                 JOIN cnt ca ON ca.doc_id = doc_a
                 JOIN cnt cb ON cb.doc_id = doc_b
                 WHERE round(shared * 1.0 / (ca.n_sh + cb.n_sh - shared), 4) >= 0.5),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM jpairs
                UNION ALL SELECT doc_b, doc_a FROM jpairs),
      reach(node, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node)
      SELECT node AS doc_id, min(comp) AS component
      FROM reach
      GROUP BY node
      ORDER BY doc_id""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x16_ivf_ann" -> (x16IvfAnn _),
    "x19_approx_quantile" -> (x19ApproxQuantile _),
    "x20_contamination" -> (x20Contamination _),
    "x21_term_mask" -> (x21TermMask _),
    "x17_stratified_sample" -> (x17StratifiedSample _),
    "x18_dup_clusters" -> (x18DupClusters _))
}
