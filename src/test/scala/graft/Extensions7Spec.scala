package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions7

/** Semantic invariants for the batch-7 operators (x48-x50) beyond the
  * value-level DuckDB oracle: prune-fraction bounds, novelty on a
  * constructed overlap, and padding-report accounting identities.
  */
class Extensions7Spec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("x48 density prune drops at most the configured fraction per cell, never the whole cell") {
    val df = Extensions7.densityPrune(emb, "vec_id", "embedding",
      signBits = 4, dropNum = 1, dropDen = 4)
    val perCell = df.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("dropped"))
      .collect()
    perCell.foreach { r =>
      val (n, dropped) = (r.getAs[Long]("n"), r.getAs[Long]("dropped"))
      // rk*4 > n  ⇔  dropped = floor(n/4)
      assert(dropped == n / 4,
        s"cell of $n must drop exactly floor(n/4), dropped $dropped")
    }
    // dropped rows are the most-central ones: per cell, every dropped sim
    // >= every kept sim (equality allowed at a rounding-tie boundary)
    val dropMin = df.filter(!col("keep")).groupBy("cell").agg(min("sim").as("dmin"))
    val keepMax = df.filter(col("keep")).groupBy("cell").agg(max("sim").as("kmax"))
    val inverted = dropMin.join(keepMax, Seq("cell"))
      .filter(col("dmin") < col("kmax")).count()
    assert(inverted == 0, "a dropped member scored less central than a kept one")
  }

  test("x49 novelty is 0 for fully-seen text and 1 for unseen, mixed in between") {
    import spark.implicits._
    val train = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c d e f g h"),             // every shingle in train
      (11L, "p q r s t u v w"),             // none in train
      (12L, "a b c d e p q r s t")          // 1 of 6 shingles seen
    ).toDF("doc_id", "text")
    val m = Extensions7.noveltyScore(train, eval, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(m(10L) == 0.0, s"fully-seen doc must be 0.0, got ${m(10L)}")
    assert(m(11L) == 1.0, s"unseen doc must be 1.0, got ${m(11L)}")
    assert(m(12L) > 0.0 && m(12L) < 1.0, s"mixed doc strictly between, got ${m(12L)}")
  }

  test("x50 padding report accounting: buckets sum to the global row, waste decreases with bucketing") {
    val rows = Extensions7.x50PaddingReport(spark, sf0001).collect()
    val (global, buckets) = rows.partition(_.getAs[Long]("len_bucket") == -1L)
    assert(global.length == 1)
    val g = global.head
    assert(buckets.map(_.getAs[Long]("n_docs")).sum == g.getAs[Long]("n_docs"))
    assert(buckets.map(_.getAs[Long]("sum_tokens")).sum == g.getAs[Long]("sum_tokens"))
    // bucketed capacity never exceeds global-max capacity
    assert(buckets.map(_.getAs[Long]("capacity")).sum <= g.getAs[Long]("capacity"))
    rows.foreach { r =>
      val pf = r.getAs[Double]("pad_frac")
      assert(pf >= 0.0 && pf < 1.0, s"pad_frac out of range: $pf")
    }
  }
}
