package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions6, Extensions10}

/** Semantic invariants for the batch-10 operators (x57-x59) beyond the
  * value-level DuckDB oracle: sketch-vs-exact agreement on planted
  * overlap, and validation catching planted defects.
  */
class Extensions10Spec extends SparkSpec {

  test("x57 signature estimate tracks exact source overlap on planted near-identical sources") {
    import spark.implicits._
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      ("A", shared + " endA only here"),
      ("B", shared + " endB differs too"),
      ("C", (100 to 160).map(i => s"other$i").mkString(" "))
    ).toDF("source", "text")
    val est = Extensions10.sourceOverlapSketch(corpus, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("est_jaccard")).toMap
    val exact = Extensions6.sourceOverlap(corpus, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jaccard")).toMap
    // A-B share most shingles (true J ~ 0.85): the 32-perm estimate must
    // land within 0.25 of exact, and far above the disjoint C pairs
    val abExact = exact(("A", "B"))
    assert(abExact > 0.7, s"planted overlap should be high, got $abExact")
    assert(math.abs(est(("A", "B")) - abExact) <= 0.25,
      s"estimate ${est(("A", "B"))} too far from exact $abExact")
    assert(est.getOrElse(("A", "C"), 0.0) <= 0.1 &&
      est.getOrElse(("B", "C"), 0.0) <= 0.1,
      "disjoint sources must estimate near zero")
  }

  test("x58 sketch bound holds on the fixture (boolean column all true)") {
    val bad = Extensions10.x58SourceVocab(spark, sf0001)
      .filter(!col("vocab_in_bound")).count()
    assert(bad == 0, "HLL estimate left its 3*rsd envelope")
  }

  test("x59 validation flags planted zero, ragged, and NaN vectors") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f), 0),            // zero norm
      (3L, Array(1.0f, 2.0f), 0),                  // ragged dim
      (4L, Array(Float.NaN, 1.0f, 1.0f), 1)        // non-finite
    ).toDF("vec_id", "embedding", "label")
    val m = Extensions10.embeddingValidation(corpus, "embedding", "label")
      .collect().map(r => r.getAs[Int]("grp") -> r).toMap
    assert(m(0).getAs[Long]("n_zero") == 1L, "zero vector must be counted")
    assert(m(0).getAs[Int]("min_dim") == 2 && m(0).getAs[Int]("max_dim") == 3,
      "ragged dimensions must surface in min/max")
    assert(m(1).getAs[Long]("n_nonfinite") == 1L, "NaN coordinate must be counted")
  }
}
