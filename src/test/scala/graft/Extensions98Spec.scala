package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions98

/** Batch-98 invariants: the histogram reads a planted mega-cluster +
  * pair tail exactly; the leakage matrix separates within- from
  * cross-source syndication.
  */
class Extensions98Spec extends SparkSpec {

  test("x224 planted: one 4-cluster and one pair bin exactly; singletons only in the denominator") {
    import spark.implicits._
    def run(off: Int) = (off until off + 30).map(i => s"c${i % 80}").mkString(" ")
    val corpus = Seq(
      (1L, run(0)), (2L, run(0)), (3L, run(0)), (4L, run(0)),  // 4-cluster
      (10L, run(40)), (11L, run(40)),                           // pair
      (20L, run(55)))                                            // singleton
      .toDF("doc_id", "text")
    val out = Extensions98.dupClusterSizes(corpus, "doc_id", "text", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 4L))
    assert(out(4L).getAs[Long]("n_clusters") == 1L &&
      out(4L).getAs[Long]("n_docs") == 4L &&
      out(4L).getAs[Long]("example_component") == 1L)
    assert(out(2L).getAs[Long]("n_docs") == 2L)
    // share denominator counts the singleton too: 4/7 = 0.5714
    assert(out(4L).getAs[Double]("doc_share") == 0.5714, s"${out(4L)}")
  }

  test("x225 planted: within-source and cross-source cells split correctly") {
    import spark.implicits._
    def run(off: Int) = (off until off + 30).map(i => s"c${i % 80}").mkString(" ")
    val corpus = Seq(
      (1L, run(0), "web"), (2L, run(0), "web"),       // within web
      (3L, run(40), "web"), (4L, run(40), "books"),   // cross
      (5L, run(55), "books"))
      .toDF("doc_id", "text", "source")
    val out = Extensions98.sourceLeakageMatrix(corpus, "doc_id", "text", "source",
        threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("web", "web"), ("books", "web")))
    assert(!out(("web", "web")).getAs[Boolean]("is_cross"))
    val cross = out(("books", "web"))
    assert(cross.getAs[Boolean]("is_cross") && cross.getAs[Long]("n_pairs") == 1L)
    assert(cross.getAs[Double]("mean_jaccard") == 1.0)
  }
}
