package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions26

/** Batch-26 invariants beyond the value-level oracle: the trained
  * logistic-regression quality classifier must actually LEARN (the
  * oracle only proves both engines run the same arithmetic).
  */
class Extensions26Spec extends SparkSpec {

  test("x94 fixture: training separates the Gopher labels (AUC near 1, far from chance)") {
    val scored = SparkEntry.queries("x94_quality_logreg")(spark, sf0001)
    val auc = Extensions26.rankAuc(scored, "margin_micro", "label")
      .head().getDouble(0)
    assert(auc > 0.9, s"trained AUC $auc must beat 0.9 on the fixture " +
      "(hashed BOW carries the rule-card signal)")
  }

  test("x94 determinism: two independent trainings produce identical weights") {
    import spark.implicits._
    val labeled = Seq.tabulate(80)(i =>
      (i.toLong, if (i % 2 == 0) "good clean prose here" else "spam junk noise words",
        i % 2 == 0))
      .toDF("doc_id", "text", "keep")
    val w1 = Extensions26.trainFromText(labeled, "doc_id", "text", "keep")
    val w2 = Extensions26.trainFromText(labeled, "doc_id", "text", "keep")
    assert(w1.sameElements(w2), "fixed-iteration integer GD is a pure function")
  }

  test("planted signal: the planted token's bucket carries the most positive weight and scores are monotone in the signal") {
    import spark.implicits._
    // label = presence of the planted token; filler tokens are shared
    // noise. 0/1/2 plantings give a 3-level signal to test monotonicity.
    val planted = "winqualitytoken"
    val docs = Seq.tabulate(120) { i =>
      val nPlant = i % 3
      val text = (Seq.fill(nPlant)(planted) ++
        Seq.fill(8)(s"filler${i % 7}")).mkString(" ")
      (i.toLong, text, nPlant > 0)
    }.toDF("doc_id", "text", "keep")
    val w = Extensions26.trainFromText(docs, "doc_id", "text", "keep")
    val plantedBucket = (graft.functions.Md5Bucket60.fold(
      java.security.MessageDigest.getInstance("MD5")
        .digest(planted.getBytes("UTF-8"))) % Extensions26.NumBuckets).toInt
    assert(w(plantedBucket) == w.dropRight(1).max,
      "the planted token's bucket must carry the largest token weight")
    assert(w(plantedBucket) > 0, "planted-token weight must be positive")
    // monotonicity: mean margin strictly increases with planting count
    val scored = Extensions26.trainAndScore(docs, "doc_id", "text", "keep")
      .withColumn("n_plant", pmod(col("doc_id"), lit(3L)))
    val means = scored.groupBy("n_plant").agg(avg("margin_micro").as("m"))
      .orderBy("n_plant").collect().map(_.getDouble(1))
    assert(means(0) < means(1) && means(1) < means(2),
      s"margins must be monotone in the planted-signal count: ${means.toSeq}")
    // and the learned model separates the planted labels perfectly here
    val auc = Extensions26.rankAuc(scored, "margin_micro", "label")
      .head().getDouble(0)
    assert(auc > 0.99, s"planted-signal AUC $auc")
  }

  test("rankAuc: chance for random labels on constant scores; exact 1.0 for separable") {
    import spark.implicits._
    val sep = (1 to 50).map(i => (i.toDouble, i > 25)).toDF("s", "y")
    assert(Extensions26.rankAuc(sep, "s", "y").head().getDouble(0) == 1.0)
    // all-tied scores: every rank is the global average -> AUC exactly 0.5
    val tied = (1 to 50).map(i => (1.0, i % 2 == 0)).toDF("s", "y")
    assert(Extensions26.rankAuc(tied, "s", "y").head().getDouble(0) == 0.5)
  }

  test("weights artifact: one row per bucket + bias, bias last") {
    val w = Array.tabulate(Extensions26.NumBuckets + 1)(_.toLong)
    val df = Extensions26.logregWeights(spark, w)
    assert(df.count() == Extensions26.NumBuckets + 1)
    assert(df.filter(col("feature") === "bias").head().getLong(1) ==
      Extensions26.NumBuckets.toLong)
  }
}
