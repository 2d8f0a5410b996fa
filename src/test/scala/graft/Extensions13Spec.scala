package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions13

/** Semantic invariants for the batch-13 operators (x64-x65). */
class Extensions13Spec extends SparkSpec {

  test("x64 corpus diff classifies a constructed two-version corpus exactly") {
    import spark.implicits._
    val prev = Seq((1L, "kept the same"), (2L, "will change"), (3L, "will vanish"))
      .toDF("doc_id", "text")
    val next = Seq((1L, "kept the same"), (2L, "has changed"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val m = Extensions13.corpusDiff(prev, next, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(m == Map("same" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L),
      s"got $m")
  }

  test("x64 diff accounting: classes partition both snapshots") {
    val rows = Extensions13.x64CorpusDiff(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val nPrev = d.filter(pmod(col("doc_id"), lit(7L)) =!= 0L).count()
    val nNext = d.filter(pmod(col("doc_id"), lit(11L)) =!= 0L).count()
    assert(rows("same") + rows("changed") + rows("removed") == nPrev,
      "prev = same + changed + removed")
    assert(rows("same") + rows("changed") + rows("added") == nNext,
      "next = same + changed + added")
    assert(rows.values.forall(_ > 0), s"every class must be exercised: $rows")
  }

  test("x65 zipf slope is ~-1 on a planted power-law corpus and ~0 on a uniform one") {
    import spark.implicits._
    // freq(token_r) = floor(1000/r): a true Zipf distribution
    val zipfText = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"tok$r")).mkString(" ")
    val zipf = Extensions13.zipfFit(Seq((1L, zipfText)).toDF("doc_id", "text"), "text", topK = 30)
      .collect().head
    val slope = zipf.getAs[Double]("zipf_slope")
    assert(slope < -0.9 && slope > -1.1, s"planted 1/r law must fit ~-1, got $slope")
    assert(zipf.getAs[Double]("fit_r2") > 0.99, "power law must fit cleanly")
    val uniText = (1 to 50).flatMap(r => Seq.fill(20)(s"tok$r")).mkString(" ")
    val uni = Extensions13.zipfFit(Seq((1L, uniText)).toDF("doc_id", "text"), "text", topK = 30)
      .collect().head
    assert(math.abs(uni.getAs[Double]("zipf_slope")) < 0.05,
      s"uniform corpus must fit ~0, got ${uni.getAs[Double]("zipf_slope")}")
  }
}
