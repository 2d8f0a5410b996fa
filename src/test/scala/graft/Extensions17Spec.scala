package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions16, Extensions17}

/** Batch-17 invariants beyond the value-level oracles. */
class Extensions17Spec extends SparkSpec {

  test("x71 importance weights separate a planted target domain") {
    import spark.implicits._
    // two disjoint vocabularies: target docs speak "tql", the rest "src".
    // Every tql bigram is frequent in-target and absent outside, so DSIR
    // weights must come out positive for target-domain docs and negative
    // for the rest — the resampling direction the operator exists for.
    val corpus = ((1L to 10L).map(i => (i, "tql alpha tql beta tql gamma", true)) ++
      (11L to 40L).map(i => (i, "src one src two src three", false)))
      .toDF("doc_id", "text", "is_t")
    val w = Extensions17.importanceWeights(corpus, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    assert((1L to 10L).forall(w(_) > 0), s"target docs must score positive: $w")
    assert((11L to 40L).forall(w(_) < 0), s"source docs must score negative: $w")
    // identical docs score identically
    assert(w(1L) == w(2L) && w(11L) == w(12L))
  }

  test("x71 docs with < 2 tokens get weight 0, not a dropped row") {
    import spark.implicits._
    val corpus = Seq((1L, "single"), (2L, "two tokens here"))
      .toDF("doc_id", "text")
    val rows = Extensions17.importanceWeights(corpus, "doc_id", "text", lit(false))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("weight"))).toMap
    assert(rows(1L) == (0L, 0.0), "bigram-less doc must survive with weight 0")
    assert(rows(2L)._1 == 2L)
  }

  test("x72 resolution: exactly one survivor per component, and it is the best copy") {
    val df = SparkEntry.queries("x72_resolve_duplicates")(spark, sf0001)
    val rows = df.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("component"), r.getAs[Long]("quality"), r.getAs[Boolean]("keep")))
    assert(rows.length == 500, "decision table must cover the whole corpus")
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._4) == 1, s"component $comp keeps ${members.count(_._4)} docs")
      val winner = members.find(_._4).get
      val best = members.minBy(m => (-m._3, m._1))
      assert(winner == best,
        s"component $comp kept $winner but best by (quality desc, id) is $best")
    }
    // singletons keep themselves
    byComp.filter(_._2.length == 1).foreach { case (_, Array(m)) => assert(m._4) }
    // clustered components exist on this fixture (x18 finds 47 clustered docs)
    assert(byComp.exists(_._2.length > 1), "fixture must produce multi-doc components")
  }

  test("x73 encoding agrees with a driver-side reference encoder") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val merges = Extensions16.trainBpe(d, "text", numMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    def encode(word: String): Int = {
      var syms = word.split("").toVector
      merges.foreach { case (l, r) =>
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            buf += (l + r); i += 2
          } else { buf += syms(i); i += 1 }
        }
        syms = buf.toVector
      }
      syms.length
    }
    val expected = d.select(col("doc_id"), split(lower(col("text")), " ").as("tk"))
      .collect().map { r =>
        val toks = r.getSeq[String](1).filter(_.nonEmpty)
        r.getLong(0) -> (toks.length.toLong, toks.map(encode(_).toLong).sum)
      }.toMap
    val got = Extensions17.applyBpe(d, "doc_id", "text", merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"))).toMap
    assert(got == expected, "distributed encode must equal the reference encoder")
  }

  test("x73 subword count shrinks monotonically as merges apply") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val merges = Extensions16.trainBpe(d, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    def total(k: Int): Long = Extensions17.applyBpe(d, "doc_id", "text", merges.take(k))
      .agg(sum("n_subwords")).head().getLong(0)
    val t0 = total(0); val t4 = total(4); val t8 = total(8)
    assert(t0 > t4 && t4 > t8,
      s"each applied merge must strictly shrink this corpus: $t0, $t4, $t8")
  }
}
