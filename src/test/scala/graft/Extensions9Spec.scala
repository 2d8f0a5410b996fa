package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions9

/** Semantic invariants for the batch-9 operators (x54-x56) beyond the
  * value-level DuckDB oracle.
  */
class Extensions9Spec extends SparkSpec {

  test("x54 stopword inference picks the universal token and ratios are exact") {
    import spark.implicits._
    // "the" appears in every doc (df=3); "rare"/"words" in one each
    val corpus = Seq(
      (1L, "the alpha the beta"),
      (2L, "the gamma delta"),
      (3L, "the rare words")
    ).toDF("doc_id", "text")
    val m = Extensions9.stopwordRatio(corpus, "doc_id", "text", topK = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_stop"), r.getAs[Double]("stop_ratio"))).toMap
    assert(m(1L) == (2L, 0.5), s"doc 1: two 'the' of four tokens, got ${m(1L)}")
    assert(m(2L) == (1L, 0.3333))
    assert(m(3L) == (1L, 0.3333))
  }

  test("x54 report is total: a null-text doc appears with zero tokens, not silently dropped") {
    import spark.implicits._
    val corpus = Seq((1L, "some words here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = Extensions9.stopwordRatio(corpus, "doc_id", "text", topK = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(rows.keySet == Set(1L, 2L), s"every input doc must be reported, got ${rows.keySet}")
    assert(rows(2L) == 0L, "null text reports zero tokens")
  }

  test("x55 entropy is 0 for a monolingual source and ln(k) for a uniform one") {
    import spark.implicits._
    val corpus = (
      (1 to 8).map(i => (s"d$i", "mono", "en")) ++
      Seq("en", "fr", "de", "zh").flatMap(l => (1 to 2).map(i => (s"u$l$i", "uni", l)))
    ).toDF("doc_id", "source", "lang")
    val m = Extensions9.sourceLangEntropy(corpus, "source", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_langs"), r.getAs[String]("top_lang"),
          r.getAs[Double]("lang_entropy"))).toMap
    assert(m("mono") == (1L, "en", 0.0), s"got ${m("mono")}")
    val (k, top, h) = m("uni")
    assert(k == 4L && top == "de", s"uniform ties break lexicographically, got ${m("uni")}")
    assert(math.abs(h - math.log(4.0)) < 1e-3, s"uniform over 4 must be ln 4, got $h")
  }

  test("x56 q_norm spans [0,1] within every source and is monotone in the score") {
    val df = Extensions9.x56QuantileNormalize(spark, sf0001)
    val bySource = df.groupBy("source")
      .agg(min(col("q_norm")).as("lo"), max(col("q_norm")).as("hi")).collect()
    bySource.foreach { r =>
      assert(r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 1.0,
        s"percent_rank must span [0,1] per source: $r")
    }
    val inversions = df.as("a").join(df.as("b"),
        col("a.source") === col("b.source")
          && col("a.score") < col("b.score")
          && col("a.q_norm") > col("b.q_norm"))
      .count()
    assert(inversions == 0, "q_norm must be monotone in the raw score within a source")
  }
}
