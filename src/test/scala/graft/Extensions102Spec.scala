package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions, Extensions102}

/** Batch-102 invariants: the codepoint path sees what the word path is
  * blind to on unsegmented scripts, and the router sends each script to
  * the tokenizer that works for it.
  */
class Extensions102Spec extends SparkSpec {

  // two CJK near-dups (one clause rewritten), one unrelated CJK doc, two
  // English near-dups, one unrelated English doc — no spaces in the CJK
  // texts, exactly the regime that collapses whitespace shingling
  private val cjkA = "深度学习模型需要大量高质量的训练数据才能在新任务上泛化良好并保持稳定表现"
  private val cjkB = "深度学习模型需要大量高质量的训练数据才能在下游评测中泛化良好并保持稳定表现"
  private val cjkC = "春江潮水连海平海上明月共潮生滟滟随波千万里何处春江无月明"
  private val engA = "large language models require vast amounts of high quality training data to generalize well across downstream tasks"
  private val engB = "large language models require vast amounts of high quality training data to generalize well across most evaluation tasks"
  private val engC = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn"

  private def fixture = {
    import spark.implicits._
    Seq((1L, cjkA), (2L, cjkB), (3L, cjkC),
      (4L, engA), (5L, engB), (6L, engC)).toDF("doc_id", "text")
  }

  test("the word chain is blind to the planted CJK near-dup; the codepoint chain finds it") {
    val word = Extensions.jaccardPairs(fixture, "doc_id", "text", 0.3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!word.contains((1L, 2L)),
      s"whitespace shingles cannot see inside an unsegmented doc: $word")
    val char = Extensions102.charGramJaccardPairs(fixture, "doc_id", "text", 0.3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(char.contains((1L, 2L)), s"codepoint grams must find the CJK pair: $char")
    assert(!char.contains((1L, 3L)) && !char.contains((2L, 3L)),
      s"the unrelated CJK doc must not pair: $char")
  }

  test("an exact CJK copy pairs at jaccard 1 under the codepoint chain") {
    import spark.implicits._
    val df = Seq((1L, cjkA), (2L, cjkA)).toDF("doc_id", "text")
    val got = Extensions102.charGramJaccardPairs(df, "doc_id", "text", 0.5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)), s"$got")
  }

  test("script routing: CJK rides the codepoint path, English the word path, pairs union") {
    val routed = Extensions102.scriptRoutedJaccardPairs(
        fixture, "doc_id", "text", threshold = 0.3, wordShingle = 5, charGram = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed.contains((1L, 2L)), s"CJK pair must survive routing: $routed")
    assert(routed.contains((4L, 5L)), s"English pair must survive routing: $routed")
    assert(!routed.exists { case (a, b) => a <= 3 && b >= 4 },
      s"no cross-script pair may arise: $routed")
  }

  test("short-doc gram semantics match substr truncation (whole text as one gram)") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "abd")).toDF("doc_id", "text")
    val got = Extensions102.charGramJaccardPairs(df, "doc_id", "text", 0.5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"only the identical short docs pair: $got")
  }

  test("x232 fixture: despaced near-dups recovered, ordered, nonempty") {
    val rows = SparkEntry.queries("x232_chargram_dedup")(spark, sf0001).collect()
    assert(rows.nonEmpty, "the fixture's planted near-dups must survive despacing")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.4 && r.getDouble(2) <= 1.0))
  }

  test("posting cap: capped pairs are a subset of exact; a tight cap visibly binds") {
    import spark.implicits._
    // ten mutual near-dups sharing a long common body — every gram of the
    // body has df=10, so a cap of 2 starves the candidate join while the
    // exact form pairs all 45 combinations
    val body = "the shared boilerplate body of this cluster repeats verbatim across every member"
    val docs = (1L to 10L).map(i => (i, body + " tail" + i)).toDF("doc_id", "text")
    def pairs(cap: Int) = Extensions102.charGramJaccardPairs(
        docs, "doc_id", "text", 0.4, 10, gramSampleMod = 1, postingCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(0)
    val capped2 = pairs(2)
    val capped64 = pairs(64)
    assert(exact.size == 45, s"all 45 mutual pairs at cap=0: ${exact.size}")
    assert(capped64 == exact, "a cap above every posting list is lossless")
    assert(capped2.subsetOf(exact), "the verify tail keeps precision at 1")
    assert(capped2.size < exact.size, "cap=2 must visibly bind on a 10-dup cluster")
  }

  test("charGramCapCard: n_extra is zero, recall monotone in the cap, tight cap detected") {
    import spark.implicits._
    val body = "the shared boilerplate body of this cluster repeats verbatim across every member"
    val docs = (1L to 10L).map(i => (i, body + " tail" + i)).toDF("doc_id", "text")
    val card = Extensions102.charGramCapCard(
        docs, "doc_id", "text", caps = Seq(2, 8, 64))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(card.map(_._1).toSeq == Seq(2, 8, 64))
    assert(card.forall(_._5 == 0L), s"capped must be a subset of exact: ${card.toSeq}")
    assert(card.forall(r => r._2 == r._3 + r._4), "found + missed = exact")
    val recalls = card.map(_._6)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in the cap: ${recalls.toSeq}")
    assert(recalls.head < 1.0 && recalls.last == 1.0,
      s"cap=2 binds, cap=64 is lossless here: ${recalls.toSeq}")
  }

  test("postingCapPlan: planted gram-frequency geometry flips the chosen cap") {
    import spark.implicits._
    def chosen(docs: org.apache.spark.sql.DataFrame): Int =
      Extensions102.postingCapPlan(docs, "doc_id", "text")
        .filter(org.apache.spark.sql.functions.col("chosen"))
        .collect().map(_.getInt(0)).head
    // cold geometry: each near-dup pair has its OWN gram vocabulary (a
    // per-pair marker letter interleaves every position, so every
    // 10-gram carries the marker) — posting lists are <= 2 and the
    // tightest cap is already lossless
    val cold = Seq('k', 'q', 'w').zipWithIndex.flatMap { case (m, p) =>
      val base = (0 until 30).map(j => s"$m${('a' + j % 26).toChar}").mkString
      Seq((2L * p, base), (2L * p + 1, base + "zzz"))
    }.toDF("doc_id", "text")
    assert(chosen(cold) == 2, "pair-local grams: cap=2 meets the target")
    // hot geometry: one boilerplate body shared by 10 mutual dups — df=10
    // posting lists starve cap=2 AND cap=8, only cap=64 recovers recall
    val body = "the shared boilerplate body of this cluster repeats verbatim across every member"
    val hot = (1L to 10L).map(i => (i, body + " tail" + i)).toDF("doc_id", "text")
    assert(chosen(hot) == 64, "hot boilerplate grams force the largest cap")
  }

  test("charGramJaccardPairsPlanned: planned result equals the chosen-cap run") {
    import spark.implicits._
    val body = "the shared boilerplate body of this cluster repeats verbatim across every member"
    val docs = (1L to 10L).map(i => (i, body + " tail" + i)).toDF("doc_id", "text")
    val planned = Extensions102.charGramJaccardPairsPlanned(
        docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Extensions102.charGramJaccardPairs(
        docs, "doc_id", "text", postingCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planned == direct, "the plan must feed the dial it chose")
  }
}
