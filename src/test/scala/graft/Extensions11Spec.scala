package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions11

/** Semantic invariants for the batch-11 operators (x60-x61). */
class Extensions11Spec extends SparkSpec {

  test("x60 split is exhaustive, deterministic, and stratification holds per source") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val s1 = Extensions11.stratifiedSplit(d, "doc_id", 100, 100)
    // exhaustive: every row gets exactly one split label
    assert(s1.filter(!col("split").isin("train", "val", "test")).count() == 0)
    assert(s1.count() == d.count())
    // deterministic across runs
    val a = s1.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Extensions11.stratifiedSplit(d, "doc_id", 100, 100)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
    // the split is map-only: no exchange in the plan
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
    // held-out fractions land near 10% each (md5 uniformity at n=500)
    val frac = s1.filter(col("split") =!= "train").count().toDouble / d.count()
    assert(frac > 0.1 && frac < 0.3, s"val+test fraction wildly off: $frac")
  }

  test("x61 budget selection takes the best-scored docs and lands near the budget") {
    val rows = Extensions11.x61BudgetSelect(spark, sf0001).collect()
    val sel = rows.filter(_.getAs[Boolean]("selected"))
    val selTokens = sel.map(_.getAs[Long]("n_tokens")).sum
    // every shard overshoots by < 1 doc: total within nShards * max doc len
    val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
    assert(selTokens >= 12000L && selTokens < 12000L + 4 * maxDoc,
      s"selected $selTokens tokens for a 12000 budget (maxDoc $maxDoc)")
    // within each shard, no unselected doc outscores a selected one
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (shard, rs) =>
      val minSel = rs.filter(_.getAs[Boolean]("selected")).map(_.getAs[Double]("score")).min
      val maxUnsel = rs.filter(!_.getAs[Boolean]("selected"))
        .map(_.getAs[Double]("score")).foldLeft(Double.MinValue)(math.max)
      assert(maxUnsel <= minSel,
        s"shard $shard: unselected score $maxUnsel beats selected $minSel")
    }
  }
}
