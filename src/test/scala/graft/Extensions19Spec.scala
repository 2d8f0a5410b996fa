package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions19

/** Batch-19 invariants beyond the value-level oracles. */
class Extensions19Spec extends SparkSpec {

  test("x77 gate: drops are exactly the x20 flags, keeps carry no match") {
    val gate = SparkEntry.queries("x77_decontaminate")(spark, sf0001)
    val flags = SparkEntry.queries("x20_contamination")(spark, sf0001)
      .select(col("train_id")).collect().map(_.getLong(0)).toSet
    val dropped = gate.filter(!col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(dropped == flags, s"gate drops $dropped but x20 flags $flags")
    assert(gate.filter(!col("keep") && col("overlap") < 0.3).count() == 0)
    assert(gate.filter(col("keep") && col("matched_eval_id").isNotNull).count() == 0)
    assert(dropped.nonEmpty, "fixture must produce contaminated docs")
  }

  test("x78 split never separates a near-dup pair; an id-hash split would") {
    val split = SparkEntry.queries("x78_cluster_safe_split")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[String]("split"))).toMap
    val pairs = SparkEntry.queries("x02_jaccard_pairs")(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // zero leakage: both ends of every near-dup pair share a split
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"pair ($a,$b) split across ${split(a)._2}/${split(b)._2}")
      assert(split(a)._1 == split(b)._1, "pair must share a component")
    }
    // the guard is not vacuous: hashing DOC ids (the naive split) would
    // tear at least one of these pairs apart at the same permilles
    def idBucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000
    }
    def idSplit(id: Long): String = {
      val b = idBucket(id)
      if (b < 100) "test" else if (b < 200) "val" else "train"
    }
    assert(pairs.exists { case (a, b) => idSplit(a) != idSplit(b) },
      "fixture pairs all survive an id-hash split — leakage test is vacuous")
    // split proportions are near the 10/10/80 nominal
    val n = split.size.toDouble
    val byShare = split.values.groupBy(_._2).view.mapValues(_.size / n).toMap
    assert(byShare("test") > 0.05 && byShare("test") < 0.16, s"test share ${byShare("test")}")
    assert(byShare("val") > 0.05 && byShare("val") < 0.16, s"val share ${byShare("val")}")
    assert(byShare("train") > 0.7, s"train share ${byShare("train")}")
  }

  test("x78 custom permilles move the boundary deterministically") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = SparkEntry.queries("x02_jaccard_pairs")(spark, sf0001)
      .select(col("doc_a"), col("doc_b"))
    val wide = Extensions19.clusterSafeSplit(d, "doc_id", pairs, "doc_a", "doc_b",
      valPermille = 300, testPermille = 300)
    val shares = wide.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shares("train") < shares.values.sum * 0.55,
      s"train must shrink under 30/30/40: $shares")
  }
}
