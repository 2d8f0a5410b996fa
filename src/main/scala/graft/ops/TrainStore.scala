package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainer-facing corpus materialization: the storage layout a training
  * job actually reads. [[Extensions6.trainingOrder]] decides WHERE each
  * document goes (shard) and WHEN it is seen (ord); this writes that
  * decision down — `partitionBy(shard)`, rows sorted by `ord` INSIDE
  * each shard file — so the trainer streams shard directories in
  * filename order and consumes a reproducible global shuffle with zero
  * read-time sorting.
  *
  * Scale: one hash exchange on shard + per-shard sort (the same cost the
  * order assignment already paid), then a partitioned write. Reads are
  * pure sequential scans; the `ord` column stays in the data as the
  * resume cursor (skip rows with ord <= checkpoint after a restart).
  */
object TrainStore {

  /** Assign the training order and write ordered shard directories.
    * `columns` picks the payload to materialize (ids and order columns
    * are always kept).
    */
  def writeShards(
      corpus: DataFrame, idCol: String, nShards: Int, path: String,
      columns: Seq[String]): Unit = {
    val ordered = Extensions6.trainingOrder(corpus, idCol, nShards)
      .select((Seq(idCol, "shard", "ord") ++ columns).distinct.map(col): _*)
    ordered
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }

  /** Read one shard in training order. Files carry rows ord-sorted, but
    * a multi-file shard (appends, or file splits at read time)
    * interleaves across read partitions — the trainer's contract is the
    * `ord` column, so this sorts GLOBALLY on it. Cheap: the sort spans
    * one shard (corpus/nShards rows), and each input split is already
    * ord-sorted so the exchange feeds nearly-sorted runs.
    */
  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("shard") === shard)
      .orderBy(col("ord"))
}
