package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions18

/** Batch-18 invariants beyond the value-level oracles. */
class Extensions18Spec extends SparkSpec {

  test("x74 buckets split every language into near-equal thirds") {
    val df = SparkEntry.queries("x74_perplexity_buckets")(spark, sf0001)
    val counts = df.groupBy("lang", "bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = counts.keys.map(_._1).toSet
    langs.foreach { l =>
      val h = counts.getOrElse((l, "head"), 0L)
      val m = counts.getOrElse((l, "middle"), 0L)
      val t = counts.getOrElse((l, "tail"), 0L)
      val n = h + m + t
      assert(h > 0 && m > 0 && t > 0, s"$l: empty bucket ($h/$m/$t)")
      // exact interpolated terciles: each bucket near n/3 — ties at the
      // rounded 4dp boundary can shift a handful of docs (en: 68/63/62
      // at n=193), a genuinely skewed split cannot
      val tol = math.max(2.0, 0.04 * n)
      Seq(h, m, t).foreach(c =>
        assert(math.abs(c - n / 3.0) <= tol, s"$l: skewed split $h/$m/$t"))
    }
    assert(langs.size == 5)
  }

  test("x74 head has strictly lower mean cross-entropy than tail, per language") {
    val df = SparkEntry.queries("x74_perplexity_buckets")(spark, sf0001)
    val means = df.groupBy("lang", "bucket").agg(avg("cross_entropy").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    means.keys.map(_._1).toSet.foreach { (l: String) =>
      assert(means((l, "head")) < means((l, "middle")),
        s"$l: head must be cleaner than middle")
      assert(means((l, "middle")) < means((l, "tail")),
        s"$l: middle must be cleaner than tail")
    }
  }

  test("x75 upsampling emits exactly the granted epochs, deterministically") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val up = Extensions18.epochUpsample(d, "doc_id", "source",
      Map("src0" -> 3, "src1" -> 2))
    // per-source copy counts are exactly the granted epochs
    val perDoc = up.groupBy("doc_id", "source").count()
    val wrong = perDoc.filter(
      (col("source") === "src0" && col("count") =!= 3) ||
      (col("source") === "src1" && col("count") =!= 2) ||
      (col("source") =!= "src0" && col("source") =!= "src1" && col("count") =!= 1))
      .count()
    assert(wrong == 0, "every doc must appear exactly its source's epoch count")
    // (doc, epoch) is unique and ord_key is deterministic across runs
    assert(up.groupBy("doc_id", "epoch").count().filter(col("count") > 1).count() == 0)
    val k1 = up.select("doc_id", "epoch", "ord_key").collect().toSet
    val k2 = Extensions18.epochUpsample(d, "doc_id", "source",
        Map("src0" -> 3, "src1" -> 2))
      .select("doc_id", "epoch", "ord_key").collect().toSet
    assert(k1 == k2)
    // copies of the same doc scatter: epochs of one doc must not be
    // adjacent in ord_key order globally (md5 disperses) — check that at
    // least 90% of multi-epoch docs have non-adjacent copies
    val ordered = up.orderBy("ord_key").select("doc_id").collect().map(_.getLong(0))
    val adjacentDups = ordered.sliding(2).count(w => w.length == 2 && w(0) == w(1))
    assert(adjacentDups < 5, s"$adjacentDups adjacent duplicate copies — shuffle key not dispersing")
  }

  test("x75 refuses zero-epoch grants (drops are a filter's job)") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    intercept[IllegalArgumentException] {
      Extensions18.epochUpsample(d, "doc_id", "source", Map("src0" -> 0))
    }
  }
}
