package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions6, TrainStore}

/** The written training layout delivers exactly the assigned order. */
class TrainStoreSpec extends SparkSpec {

  test("written shards round-trip the training order exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val root = tmpDir("trainstore")
    TrainStore.writeShards(docs, "doc_id", nShards = 4, root, Seq("text", "source"))
    // every shard directory exists and carries its docs in assigned order
    val expected = Extensions6.trainingOrder(docs, "doc_id", 4)
      .select("doc_id", "shard", "ord").collect()
      .groupBy(_.getLong(1))
      .map { case (s, rs) => s -> rs.sortBy(_.getLong(2)).map(_.getLong(0)).toSeq }
    (0L until 4L).foreach { shard =>
      val got = TrainStore.readShard(spark, root, shard)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      assert(got == expected(shard),
        s"shard $shard order diverged: got ${got.take(5)}... want ${expected(shard).take(5)}...")
    }
    // payload columns survived
    val cols = spark.read.parquet(root).columns.toSet
    assert(Set("doc_id", "shard", "ord", "text", "source").subsetOf(cols))
    // partition pruning: reading one shard scans one partition directory
    val plan = TrainStore.readShard(spark, root, 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"shard read must prune:\n$plan")
  }
}
