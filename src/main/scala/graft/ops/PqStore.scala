package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the deployed form of the x102 serving path
  * (the sibling the x102 docstring promised; round-6 VERDICT item #1).
  * Completes the billion-scale ANN story: [[IvfStore]] persists raw
  * vectors routed by cell, this persists the PQ CODES routed by cell —
  * 16 bytes a vector instead of 256 — plus everything serving needs and
  * nothing else:
  *
  * {{{
  *   path/codes/cell=N/   (vec_id, m, k)        partitionBy(cell)
  *   path/centroids       (cell, cvec)          coarse quantizer, quantized space
  *   path/codebook        ModelStore PQ artifact (geometry-checked load)
  * }}}
  *
  * Serving reads ONLY the probed cell directories: the probed cell set
  * (≤ queries × probes ids) collects driver-side — the same bounded
  * list as [[IvfStore.topKFromIndex]] — and becomes an `isin` literal
  * the Parquet source turns into static partition pruning (INSET
  * PartitionFilters, asserted in PqStoreSpec). Raw vectors appear
  * nowhere: candidates are codes, per-candidate work is M table
  * lookups against the broadcast per-query distance tables. Routing,
  * distance tables, and ranking are the SAME private helpers
  * [[Extensions31.ivfPqTopK]] uses ([[Extensions31.probeCells]] /
  * [[Extensions31.adcDistTable]] / [[Extensions31.adcRank]]), so
  * store-served equals in-memory by construction — and PqStoreSpec
  * asserts it value-for-value.
  */
object PqStore {

  /** Quantize, assign each vector to its coarse cell, PQ-encode, and
    * write codes partitioned by cell with the centroid + codebook
    * sidecars. Coarse centroids are the first `nCells` vectors in id
    * order (the x16/x102 deterministic-seeding convention).
    */
  def writeIndex(
      vectors: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Long]]], path: String,
      nCells: Int = Extensions31.IvfPqCells): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qv = Extensions.materialized(
      Extensions27.quantized(vectors, idCol, vecCol))
    val cents = qv.orderBy(col("vec_id")).limit(nCells).collect()
      .map(_.getSeq[Long](1)).toSeq
    require(cents.length == nCells, s"PqStore: need at least $nCells vectors")
    val cl = Extensions31.centsLit(cents)
    val assigned = qv.select(col("vec_id"), Extensions31.cellExpr(cl, nCells).as("cell"))
    Extensions27.pqEncode(vectors, idCol, vecCol, codebook)
      .join(assigned, Seq("vec_id"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/codes")
    cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    ModelStore.writePqCodebook(spark, s"$path/codebook", codebook)
  }

  /** The stored coarse centroids, cell-ordered (bounded: nCells rows). */
  private def storedCents(spark: SparkSession, path: String): Seq[Seq[Long]] =
    spark.read.parquet(s"$path/centroids").orderBy(col("cell"))
      .collect().map(_.getSeq[Long](1)).toSeq

  /** Append new vectors: encode against the STORED codebook and assign
    * against the STORED centroids (old and new rows must agree on the
    * geometry), appending only the touched cell directories — the
    * steady-state ingest path, no rewrite.
    */
  def appendToIndex(
      newVecs: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = newVecs.sparkSession
    val codebook = ModelStore.loadPqCodebook(spark, s"$path/codebook")
    val cents = storedCents(spark, path)
    val cl = Extensions31.centsLit(cents)
    val qv = Extensions27.quantized(newVecs, idCol, vecCol)
    val assigned = qv.select(col("vec_id"),
      Extensions31.cellExpr(cl, cents.length).as("cell"))
    Extensions27.pqEncode(newVecs, idCol, vecCol, codebook)
      .join(assigned, Seq("vec_id"))
      .write.partitionBy("cell").mode("append").parquet(s"$path/codes")
  }

  /** Compact removed vectors OUT of the index (the [[IvfStore.compactIndex]]
    * discipline): re-assign the removed embeddings against the stored
    * centroids to find exactly the cells their codes live in, read ONLY
    * those cell directories, anti-join on vec_id, dynamically overwrite
    * the touched cells, and delete emptied cell directories outright.
    * Returns the cell ids rewritten or deleted.
    */
  def compactIndex(
      removeVecs: DataFrame, idCol: String, vecCol: String, path: String): Set[Int] = {
    val spark = removeVecs.sparkSession
    val cents = storedCents(spark, path)
    val cl = Extensions31.centsLit(cents)
    val assigned = Extensions.materialized(
      Extensions27.quantized(removeVecs, idCol, vecCol)
        .select(col("vec_id"), Extensions31.cellExpr(cl, cents.length).as("cell")))
    val cells = assigned.select(col("cell").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (cells.isEmpty) return Set.empty
    val removeIds = broadcast(assigned.select(col("vec_id")).distinct())
    val kept = Extensions.materialized(
      spark.read.parquet(s"$path/codes")
        .filter(col("cell").isin(cells: _*))
        .join(removeIds, Seq("vec_id"), "left_anti"))
    val nonEmpty = kept.select(col("cell").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try kept.repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/codes")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (cells.toSet -- nonEmpty).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/codes", s"cell=$c"), true)
    }
    cells.toSet
  }

  /** ADC top-k for a query batch against the written index, reading
    * only the probed cell directories. Identical semantics (and values)
    * to [[Extensions31.ivfPqTopK]] with the same geometry.
    */
  def topKFromIndex(
      spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 5,
      probes: Int = Extensions31.IvfPqProbes): DataFrame = {
    val codebook = ModelStore.loadPqCodebook(spark, s"$path/codebook")
    val cents = storedCents(spark, path)
    val cl = Extensions31.centsLit(cents)
    val qq = Extensions.materialized(
      Extensions27.quantized(queries, idCol, vecCol))
    val probed = Extensions31.probeCells(qq, cl, cents.length, probes)
    // bounded driver-side cell list -> literal isin -> static partition pruning
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*))
    Extensions31.adcRank(
      probed.join(codes, Seq("cell")).select(col("q_id"), col("vec_id"), col("m"), col("k")),
      Extensions31.adcDistTable(qq, codebook), k)
  }
}
