package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Twenty-ninth extension batch — retrieval diversity and graph
  * structure:
  *
  *  - MMR diverse top-k (x98): Maximal Marginal Relevance (Carbonell &
  *    Goldstein 1998) — greedy selection trading query relevance
  *    against redundancy with the already-selected set. THE dedup pass
  *    for RAG retrieval results: top-k by similarity alone returns k
  *    near-copies of the same passage; MMR returns k that COVER.
  *  - triangle counting (x99): per-node triangle participation over a
  *    thresholded co-purchase projection — the clustering-coefficient
  *    numerator, the standard cohesion metric next to x96's
  *    centrality. Runs on the ordered edge list (a < b) so each
  *    triangle is counted once, join-join-join, never enumeration of
  *    neighborhoods driver-side.
  *
  * Both follow the integer determinism discipline: x95's exact
  * ten-thousandth quantization for MMR distances; pure integer counts
  * and cross-multiplied mean thresholds (no division) for the
  * projection graph.
  */
object Extensions29 {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- x98: MMR diverse top-k ------------------------------------------------

  private def quantized(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors.select(col(idCol).as("vec_id"),
      transform(col(vecCol).cast("array<double>"),
        x => round(x * 10000.0d, 0).cast("long")).as("qv"))

  /** Exact squared L2 between the bound `qv` column and a literal vector. */
  private def distTo(vec: Seq[Long]): Column =
    aggregate(
      zip_with(col("qv"), array(vec.map(lit(_)): _*), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Greedy MMR selection: pick `k` items minimizing
    * λ·dist(query, c) − (1−λ)·min_{s∈S} dist(c, s)  (λ in tenths; lower
    * objective = more relevant AND less redundant; ties to the lower
    * id; the first pick reduces to pure relevance via min-over-∅ = 0).
    *
    * Shape (the x69 decision-loop discipline): candidates quantize and
    * materialize ONCE with their query distance; each of the k rounds
    * is one MAP pass (the ≤k selected vectors ride as literals — the
    * "penalty state" is O(k·D) longs, never a join) + one
    * TakeOrderedAndProject(1) collect — the greedy pick is inherently
    * sequential. At 100 TB the candidate set is a retrieval shortlist
    * (top-N from x16/x95), so each round is a shortlist scan.
    */
  def mmrSelect(
      vectors: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 8, lambdaTenths: Int = 7): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qv = Extensions.materialized(quantized(vectors, idCol, vecCol))
    val qRows = qv.filter(col("vec_id") === queryId).collect()
    require(qRows.nonEmpty, s"mmrSelect: query id $queryId not found")
    val qVec = qRows(0).getSeq[Long](1)
    val cand = Extensions.materialized(
      qv.filter(col("vec_id") =!= queryId)
        .select(col("vec_id"), col("qv"), distTo(qVec).as("dq")))
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long], Long, Long)]()
    for (_ <- 1 to k) {
      val minSel =
        if (sel.isEmpty) lit(0L)
        else if (sel.size == 1) distTo(sel(0)._2)
        else least(sel.toSeq.map(s => distTo(s._2)): _*)
      val obj = (lit(lambdaTenths.toLong) * col("dq")
        - lit(10L - lambdaTenths) * minSel).as("obj")
      val picked = cand
        .filter(!col("vec_id").isin(sel.toSeq.map(_._1): _*))
        .select(col("vec_id"), col("qv"), col("dq"), obj)
        .orderBy(col("obj"), col("vec_id")).limit(1).collect()(0)
      sel += ((picked.getLong(0), picked.getSeq[Long](1),
        picked.getLong(2), picked.getLong(3)))
    }
    sel.toSeq.zipWithIndex
      .map { case ((id, _, dq, obj), i) => (i + 1L, id, dq, obj) }
      .toDF("rk", "c_id", "dist_q", "obj")
  }

  /** x98: MMR-select 8 diverse neighbors of vector 0 from the fixture
    * embeddings at λ = 0.7. The DuckDB oracle replays all 8 greedy
    * rounds as generated CTEs — see the chain in [[x98OracleSql]].
    */
  def x98MmrDiverse(s: SparkSession, dir: String): DataFrame =
    mmrSelect(table(s, dir, "embeddings"), "vec_id", "embedding", queryId = 0L)
      .orderBy(col("rk"))

  private val x98OracleSql: String = {
    val dist = (a: String, b: String) =>
      s"CAST(list_sum(list_transform(generate_series(1, 64), i -> ($a.qv[i] - $b.qv[i]) * ($a.qv[i] - $b.qv[i]))) AS BIGINT)"
    val rounds = (1 to 8).map { t =>
      s"""
    ms$t AS (SELECT c.vec_id, min(${dist("c", "s")}) AS md
             FROM cand c CROSS JOIN sel${t - 1} s GROUP BY c.vec_id),
    m$t AS (SELECT c.vec_id, c.dq, 7 * c.dq - 3 * COALESCE(ms.md, 0) AS obj
            FROM cand c LEFT JOIN ms$t ms USING (vec_id)
            WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})),
    p$t AS MATERIALIZED (SELECT $t AS rk, vec_id, dq, obj FROM m$t
                         ORDER BY obj, vec_id LIMIT 1),
    sel$t AS MATERIALIZED (
      SELECT vec_id, qv FROM sel${t - 1}
      UNION ALL
      SELECT c.vec_id, c.qv FROM cand c WHERE c.vec_id = (SELECT vec_id FROM p$t))"""
    }.mkString(",")
    s"""
    WITH qt AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000.0, 0) AS BIGINT)) AS qv
      FROM embeddings),
    q AS (SELECT qv FROM qt WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT v.vec_id, v.qv, ${dist("v", "q")} AS dq
      FROM qt v CROSS JOIN q WHERE v.vec_id <> 0),
    sel0 AS (SELECT vec_id, qv FROM qt WHERE FALSE),$rounds
    SELECT CAST(rk AS BIGINT) AS rk, vec_id AS c_id, dq AS dist_q, obj
    FROM (${(1 to 8).map(t => s"SELECT * FROM p$t").mkString(" UNION ALL ")})
    ORDER BY rk"""
  }

  // ---- x99: triangle counting ------------------------------------------------

  /** Per-node triangle counts over an undirected edge list. Edges
    * normalize to a < b; triangles enumerate once each via the ordered
    * join e(a,b)⋈e(b,c)⋈e(a,c) with a < b < c — the standard
    * distributed formulation (two equi-joins; the wedge set, not node
    * neighborhoods, is the intermediate). Output (node, n_triangles)
    * for every node in the edge list (0 for triangle-free nodes).
    *
    * Scale: wedge volume Σ deg(v)² is THE cost driver — at 100 TB-class
    * graphs the a < b < c ordering already halves each join side, and
    * the classic refinement (orient edges from lower- to higher-degree
    * endpoints) bounds wedges by O(E^1.5); the fixture graph is dense
    * enough that ordering alone suffices.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    triangleCounts(edges, aCol, bCol, driverMaxEdges = 1L << 22)

  /** [[triangleCounts]] with the size gate explicit. Below
    * `driverMaxEdges` (default 4M ≈ the connectedComponents union-find
    * gate) the deduped edge list is counted ON THE DRIVER with the same
    * (deg, id) orientation and sorted-adjacency intersection — exact
    * integers, identical per-node counts, one collect instead of a
    * 2-shuffle wedge join whose row count is Σ outdeg² (the x99
    * backbone: 227k edges over ~1k suppliers → 52M wedge rows, 14.7 s
    * measured at sf0.1; the driver loop is ~100M int compares, <0.5 s —
    * r14 optimization, guide §1.2 "the distributed algorithm" + §5 "the
    * driver should do almost no data work" traded consciously: the gate
    * bounds the collect at ~64 MB, the distributed plan remains the
    * over-gate path and TriangleGateSpec asserts the two agree).
    */
  def triangleCounts(
      edges: DataFrame, aCol: String, bCol: String,
      driverMaxEdges: Long): DataFrame = {
    val e = Extensions.materialized(
      edges.select(least(col(aCol), col(bCol)).as("a"),
          greatest(col(aCol), col(bCol)).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    if (e.count() <= driverMaxEdges) return triangleCountsDriver(e)
    // degree-orientation (low (deg, id) → high): every triangle has
    // exactly ONE node with two out-edges, and out-degrees are bounded
    // by the graph degeneracy — wedge volume drops from Σ deg² to
    // Σ outdeg² = O(E^1.5) worst-case. On the dense fixture backbone
    // this cut the wedge join ~4× (measured; see PLANS.md).
    val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val ed = Extensions.materialized(e
      .join(deg.select(col("node").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("ddst")))
    val tri = ed.as("e1")
      .join(ed.as("e2"), col("e1.src") === col("e2.src")
        && struct(col("e1.ddst"), col("e1.dst")) < struct(col("e2.ddst"), col("e2.dst")))
      .join(ed.as("e3"),
        col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    e.select(col("a").as("node")).union(e.select(col("b").as("node"))).distinct()
      .join(perNode, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Driver-side exact per-node triangle counts over a deduped a<b edge
    * list (the under-gate path of [[triangleCounts]]): dense-remap the
    * node ids, orient every edge low→high by (degree, original id) —
    * the same orientation the wedge join uses — sort each out-adjacency,
    * and for every oriented edge (u,v) merge-intersect out(u)∩out(v);
    * each triangle is found exactly once (at its unique two-out-edge
    * apex) and credits all three corners. Output: every endpoint node
    * with its count (zeros included), the wedge join's exact contract.
    */
  private def triangleCountsDriver(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val es = e.select(col("a"), col("b")).as[(Long, Long)].collect()
    val idOf = new java.util.HashMap[Long, Integer](es.length * 2)
    val ids = scala.collection.mutable.ArrayBuffer[Long]()
    def dense(x: Long): Int = {
      val g = idOf.get(x)
      if (g != null) g.intValue
      else { idOf.put(x, ids.length); ids += x; ids.length - 1 }
    }
    val m = es.length
    val ea = new Array[Int](m); val eb = new Array[Int](m)
    var i = 0
    while (i < m) { ea(i) = dense(es(i)._1); eb(i) = dense(es(i)._2); i += 1 }
    val n = ids.length
    val deg = new Array[Int](n)
    i = 0; while (i < m) { deg(ea(i)) += 1; deg(eb(i)) += 1; i += 1 }
    // (deg, original id) orientation — matches struct(da, a) < struct(db, b)
    def less(u: Int, v: Int): Boolean =
      deg(u) < deg(v) || (deg(u) == deg(v) && ids(u) < ids(v))
    val outDeg = new Array[Int](n)
    i = 0
    while (i < m) {
      if (less(ea(i), eb(i))) outDeg(ea(i)) += 1 else outDeg(eb(i)) += 1
      i += 1
    }
    val start = new Array[Int](n + 1)
    var u = 0
    while (u < n) { start(u + 1) = start(u) + outDeg(u); u += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(start, n)
    i = 0
    while (i < m) {
      val (s, d) = if (less(ea(i), eb(i))) (ea(i), eb(i)) else (eb(i), ea(i))
      adj(fill(s)) = d; fill(s) += 1; i += 1
    }
    u = 0
    while (u < n) { java.util.Arrays.sort(adj, start(u), start(u + 1)); u += 1 }
    val counts = new Array[Long](n)
    u = 0
    while (u < n) {
      var ei = start(u)
      while (ei < start(u + 1)) {
        val v = adj(ei)
        var p = start(u); var q = start(v)
        while (p < start(u + 1) && q < start(v + 1)) {
          val x = adj(p); val y = adj(q)
          if (x == y) { counts(u) += 1; counts(v) += 1; counts(x) += 1; p += 1; q += 1 }
          else if (x < y) p += 1
          else q += 1
        }
        ei += 1
      }
      u += 1
    }
    val out = ids.toSeq.zipWithIndex.map { case (id, d) => (id, counts(d)) }
    spark.createDataset(out).toDF("node", "n_triangles")
  }

  /** x99: triangles of the co-purchase backbone — suppliers linked when
    * their shared-customer count is STRICTLY above the mean shared
    * count over all supplier pairs (the threshold compares exact
    * integers cross-multiplied, `shared·n_pairs > Σshared`, so no
    * division and no float enters the graph definition; a projection
    * graph without a threshold degenerates to a clique).
    */
  def x99Triangles(s: SparkSession, dir: String): DataFrame = {
    val cs = table(s, dir, "orders")
      .join(table(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct()
    val shared = cs.as("x").join(cs.as("y"),
        col("x.c") === col("y.c") && col("x.sp") < col("y.sp"))
      .groupBy(col("x.sp").as("s1"), col("y.sp").as("s2"))
      .agg(count(lit(1)).as("shared"))
    val tot = shared.agg(count(lit(1)).as("np"), sum(col("shared")).as("ts"))
    val backbone = shared.crossJoin(broadcast(tot))
      .filter(col("shared") * col("np") > col("ts"))
      .select(col("s1"), col("s2"))
    triangleCounts(backbone, "s1", "s2")
      .select(col("node").as("supp_id"), col("n_triangles"))
      .orderBy(col("supp_id"))
  }

  private val x99OracleSql: String = """
      WITH cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      shared AS (SELECT x.sp AS s1, y.sp AS s2, count(*) AS shared
                 FROM cs x JOIN cs y ON x.c = y.c AND x.sp < y.sp
                 GROUP BY 1, 2),
      tot AS (SELECT count(*) AS np, CAST(sum(shared) AS BIGINT) AS ts FROM shared),
      e AS MATERIALIZED (SELECT s1 AS a, s2 AS b FROM shared, tot
                         WHERE shared * np > ts),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1 JOIN e e2 ON e1.b = e2.a
                        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      pn AS (SELECT node, count(*) AS n_triangles FROM (
               SELECT x AS node FROM tri UNION ALL
               SELECT y FROM tri UNION ALL
               SELECT z FROM tri) GROUP BY node),
      nodes AS (SELECT DISTINCT a AS node FROM e UNION SELECT b FROM e)
      SELECT nodes.node AS supp_id,
             COALESCE(pn.n_triangles, 0) AS n_triangles
      FROM nodes LEFT JOIN pn USING (node)
      ORDER BY supp_id"""

  val oracles: Map[String, String] = Map(
    "x98_mmr_diverse" -> x98OracleSql,
    "x99_triangles" -> x99OracleSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x98_mmr_diverse" -> (x98MmrDiverse _),
    "x99_triangles" -> (x99Triangles _))
}
