package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions116

/** Batch-116 invariants: the HOF Viterbi DP equals brute-force
  * enumeration under the global tie rule (the lemma the oracle's path
  * enumeration relies on), rare composites segment through frequent
  * stems, every word stays covered, and the fixture is stable.
  */
class Extensions116Spec extends SparkSpec {

  private def pieceDf(ps: (String, Long)*) = {
    import spark.implicits._
    val t = ps.map(_._2).sum
    ps.toDF("piece", "cnt").withColumn("cost",
      round(lit(1e6) * log(lit(t.toDouble) / col("cnt")), 0).cast("long"))
  }

  test("rare composite words segment through frequent stems") {
    import spark.implicits._
    // 'blorping' (x2) is below minCount=4 as a piece; 'blorp' and 'ing'
    // are frequent standalone words -> the EM must route it through them
    val corpus = (Seq.fill(10)("blorp") ++ Seq.fill(10)("ing") ++
      Seq.fill(2)("blorping")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val words = df.select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
    val vocabTop = Extensions116.unigramPieces(df, "text", minCount = 4)
      .collect().map(_.getString(0)).toSet
    assert(vocabTop.contains("blorp") && vocabTop.contains("ing"),
      s"stems survive: $vocabTop")
    assert(!vocabTop.contains("blorping"), "the rare composite is no piece")
  }

  test("DP == brute-force enumeration under the global tie rule") {
    import spark.implicits._
    // adversarial costs engineered for ties: equal-cost pieces of
    // different lengths compete at several positions
    val pieces = pieceDf(("a", 8L), ("b", 8L), ("aa", 4L), ("ab", 4L),
      ("ba", 4L), ("aab", 2L), ("aba", 2L), ("bab", 8L))
    val words = Seq(("aabab", 1L), ("ababa", 1L), ("aabba", 1L),
      ("babab", 1L), ("aaaaa", 1L), ("ab", 1L))
      .toDF("w", "wn")
    val got = Extensions116.viterbiSegment(words, pieces, maxK = 6)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    // brute force: enumerate all segmentations, order by (cost,
    // reversed length sequence lex DESC)
    val costMap = pieces.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(6, w.length)).flatMap { k =>
        val h = w.take(k)
        if (costMap.contains(h)) segs(w.drop(k)).map(h +: _) else Nil
      }
    got.foreach { case (w, dpPieces) =>
      val best = segs(w).sortWith { (x, y) =>
        val cx = x.map(costMap).sum; val cy = y.map(costMap).sum
        if (cx != cy) cx < cy
        else {
          val lx = x.map(_.length).reverse; val ly = y.map(_.length).reverse
          val cmp = lx.zip(ly).find { case (a, b) => a != b }
          cmp.exists { case (a, b) => a > b }
        }
      }.head
      assert(dpPieces == best, s"$w: dp=$dpPieces brute=$best")
      assert(dpPieces.mkString == w, "pieces must cover the word")
    }
  }

  test("coverage: every fixture word segments, concat == word") {
    val d = graft.model.Tables.load(spark, sf0001, "documents")
    val words = d.select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
    val pieces = Extensions116.unigramPieces(d, "text", topN = 10000)
    val seg = Extensions116.viterbiSegment(words, pieces, maxK = 6)
      .collect()
    assert(seg.nonEmpty)
    seg.foreach { r =>
      assert(r.getSeq[String](2).mkString == r.getString(0),
        s"lossless cover: $r")
    }
  }

  test("x263 fixture: 40 rows, positive costs, count-ordered") {
    val r = SparkEntry.queries("x263_unigram_pieces")(spark, sf0001).collect()
    assert(r.length == 40)
    assert(r.forall(_.getLong(2) > 0L), "costs are -ln p > 0 micro-nats")
    val cnts = r.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }
}
