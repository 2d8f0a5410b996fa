package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions106

/** Batch-106 invariants: separated clusters vote their own label; the
  * hash split never reassigns a doc when the corpus grows; the leakage
  * repair leaves zero straddling near-dup pairs.
  */
class Extensions106Spec extends SparkSpec {

  test("knnClassifierEval: separated clusters read accuracy 1, a planted flip is charged to its label") {
    import spark.implicits._
    // label 0 points near (1,0,0); label 1 near (0,1,0); id 99 sits in
    // the label-1 cluster but is tagged 0 -> its vote must go to 1
    val rows =
      (0 until 6).map(i => (i.toLong, Array(10f + i, 1f, 0f), 0)) ++
      (10 until 16).map(i => (i.toLong, Array(1f, 10f + i, 0f), 1)) :+
      ((99L, Array(1f, 30f, 0f), 0))
    val got = Extensions106.knnClassifierEval(
      rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label",
      k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val l0 = got.find(_._1 == 0).get
    val l1 = got.find(_._1 == 1).get
    assert(l1 == ((1, 6L, 6L, 1.0)), s"clean cluster votes itself: $l1")
    assert(l0._2 == 7L && l0._3 == 6L, s"the planted flip must miss: $l0")
    assert(l0._4 == 0.8571)
  }

  test("x60 stratifiedSplit (the split x243 guards): growth-stable by construction") {
    import spark.implicits._
    // a doc's split is a pure md5 function of its id, so dropping half
    // the corpus must not move any survivor — the property that makes
    // yesterday's holdout still held out after re-ingestion
    val full = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val half = full.filter(col("doc_id") % 2 === 0)
    val a = graft.ops.Extensions11.stratifiedSplit(full, "doc_id")
      .select(col("doc_id"), col("split"))
    val b = graft.ops.Extensions11.stratifiedSplit(half, "doc_id")
      .select(col("doc_id"), col("split").as("split2"))
    assert(a.join(b, Seq("doc_id")).filter(col("split") =!= col("split2")).count() == 0,
      "dropping half the corpus must not move any survivor's split")
  }

  test("splitLeakage: planted cross-split near-dups are found, repair zeroes them") {
    import spark.implicits._
    // 10 planted dup pairs (i, i+100) sharing a 12-token text unique to
    // the pair; md5 scatters their splits, so some pairs straddle
    val docs = (0L until 10L).flatMap { i =>
      val t = (0 until 12).map(j => s"tok${i}x$j").mkString(" ")
      Seq((i, t), (i + 100L, t))
    }.toDF("doc_id", "text")
    val got = Extensions106.splitLeakage(docs, "doc_id", "text").head
    assert(got.getLong(0) == 10L, s"10 planted pairs: $got")
    assert(got.getLong(1) > 0L, "md5 scatter must straddle at least one pair")
    assert(got.getLong(2) >= got.getLong(1), "every leaky pair moves >= 1 doc")
    assert(got.getLong(3) == 0L, "repair leaves zero straddling pairs")
  }

  test("x241/x243 fixtures: sane shapes") {
    val kn = SparkEntry.queries("x241_knn_eval")(spark, sf0001).collect()
    assert(kn.nonEmpty && kn.map(_.getLong(1)).sum == 100L,
      "the 1-in-5 query sample of 500 vecs ranks 100 queries")
    assert(kn.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    val lk = SparkEntry.queries("x243_split_leakage")(spark, sf0001).head
    assert(lk.getLong(3) == 0L, "fixture repair must close all leaks")
  }

  test("LOO query-count guard: a share-derived query set above the cap refuses loudly") {
    import spark.implicits._
    val emb = (0 until 40).map(i => (i.toLong, Array(1f, i.toFloat, 0f), i % 2))
      .toDF("vec_id", "embedding", "label")
    // queryMod=1 on 40 rows -> 41 queries > cap 10: the blockingPlan
    // discipline — refuse with the budgeted entry point named
    val e = intercept[IllegalArgumentException] {
      Extensions106.knnClassifierEval(emb, "vec_id", "embedding", "label",
        k = 3, queryMod = 1, maxLooQueries = 10L)
    }
    assert(e.getMessage.contains("knnClassifierEvalBudgeted"),
      s"the refusal must name the scale path: ${e.getMessage}")
    // the budgeted form on the same corpus derives a mod that fits ANY cap
    val ok = Extensions106.knnClassifierEvalBudgeted(
      emb, "vec_id", "embedding", "label", k = 3, maxQueries = 10L)
    assert(ok.collect().nonEmpty)
  }
}
