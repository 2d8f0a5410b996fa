package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions, Extensions43}

/** Batch-43 invariants: the near-dup positive that tops BM25 is
  * excluded, the remaining order is BM25's, and no emitted negative is
  * a near-duplicate of its query.
  */
class Extensions43Spec extends SparkSpec {

  test("x119 planted: the near-duplicate is BM25's best hit yet never a hard negative") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " changed words"
    // confusable: shares half the vocabulary -> high BM25, low Jaccard
    val confusable = ((1 to 20).map(i => s"tok$i") ++ (1 to 20).map(i => s"other$i")).mkString(" ")
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val d = Seq((0L, base), (1L, nearDup), (2L, confusable), (3L, unrelated))
      .toDF("doc_id", "text")
    val out = Extensions43.hardNegatives(d, d.filter(col("doc_id") === 0L),
        "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(!out.map(_._1).contains(1L),
      s"the near-dup must be mined OUT of the negatives: ${out.toSeq}")
    assert(out.head == ((2L, 1L)),
      s"the confusable doc is the #1 hard negative: ${out.toSeq}")
  }

  test("x119 fixture: no emitted negative is a >=0.3 near-dup of its query; ranks are contiguous") {
    val out = SparkEntry.queries("x119_hard_negatives")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val pos = Extensions.jaccardPairs(d, "doc_id", "text", 0.3, 5)
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    out.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(!pos.contains(pair), s"emitted a near-dup pair $pair")
      assert(r.getLong(0) != r.getLong(1), "never self")
    }
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val rks = rows.map(_.getLong(3)).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq, s"q=$q ranks must be contiguous: $rks")
    }
  }
}
