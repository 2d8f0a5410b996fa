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

  test("a trainer mid-epoch keeps its pinned corpus across a re-materialization") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val root = tmpDir("trainstore_pin")
    TrainStore.writeShards(docs.filter(col("doc_id") < 300), "doc_id",
      nShards = 2, root, Seq("text"))
    // the trainer opens its shard: the manifest pin happens HERE
    val epochRead = TrainStore.readShard(spark, root, 1L)
    val before = epochRead.select("doc_id").collect().map(_.getLong(0)).toSeq
    // a re-materialization lands mid-epoch (different corpus, REPLACES the list)
    TrainStore.writeShards(docs.filter(col("doc_id") >= 300), "doc_id",
      nShards = 2, root, Seq("text"))
    // the open epoch still reads its exact corpus (immutable pinned files)
    val during = epochRead.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(during == before,
      "a pinned shard read must survive a concurrent re-materialization")
    // a FRESH read sees only the new corpus
    val fresh = TrainStore.readShard(spark, root, 1L)
      .select("doc_id").collect().map(_.getLong(0))
    assert(fresh.nonEmpty && fresh.forall(_ >= 300L),
      "a fresh read must see only the re-materialized corpus")
  }

  test("packed shards: ctx-length batches, lossless token stream, byte-equal batches across a simulated restart") {
    val ctx = 128
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val root = tmpDir("trainpack")
    val shards = s"$root/shards"; val packed = s"$root/packed"
    TrainStore.writeShards(docs, "doc_id", nShards = 3, shards, Seq("text"))
    TrainStore.packShards(spark, shards, ctx, packed)
    (0L until 3L).foreach { shard =>
      val batches = TrainStore.readPackedShard(spark, packed, shard).collect()
      // every batch except the last is exactly ctx tokens; none empty
      batches.dropRight(1).foreach(b =>
        assert(b.getAs[Long]("n_tokens") == ctx.toLong,
          s"non-final chunk must fill the context: $b"))
      assert(batches.last.getAs[Long]("n_tokens") <= ctx.toLong)
      assert(batches.forall(_.getAs[Long]("n_tokens") > 0L))
      // chunk_ord is dense from 0 (the cursor can't skip)
      assert(batches.map(_.getAs[Long]("chunk_ord")).toSeq ==
        (0L until batches.length.toLong))
      // LOSSLESS: the concatenated batches equal the shard's documents
      // concatenated in training order — no token dropped or reordered
      val packedStream = batches.map(_.getAs[String]("chunk_text")).mkString(" ")
      val docStream = TrainStore.readShard(spark, shards, shard)
        .collect().map(_.getAs[String]("text")).mkString(" ")
      assert(packedStream == docStream, s"shard $shard token stream diverged")
      // RESUME CURSOR: stop after chunk c, restart with afterChunk = c —
      // head + tail reads are byte-equal to the uninterrupted read
      val c = batches.length / 2 - 1
      val head = TrainStore.readPackedShard(spark, packed, shard)
        .filter(col("chunk_ord") <= c).collect()
      val tail = TrainStore.readPackedShard(spark, packed, shard, afterChunk = c)
        .collect()
      assert((head ++ tail).map(_.getAs[String]("chunk_text")).toSeq ==
        batches.map(_.getAs[String]("chunk_text")).toSeq,
        s"shard $shard: restart at cursor $c must replay byte-equal batches")
    }
    // packed reads prune to the shard directory like the raw store
    val plan = TrainStore.readPackedShard(spark, packed, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"packed read must prune:\n$plan")
  }
}
