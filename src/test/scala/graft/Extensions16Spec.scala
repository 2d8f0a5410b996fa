package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions16, Extensions2}

/** Batch-16 invariants beyond the value-level oracles: planted-span
  * behavior of the substring dedup, the BPE trainer against an
  * independent driver-side reference implementation, and partition
  * pruning on the persisted-IVF recall path.
  */
class Extensions16Spec extends SparkSpec {

  // ---- x68 -------------------------------------------------------------------

  test("x68 planted span is stripped from BOTH docs; singleton text is byte-identical") {
    import spark.implicits._
    val span = "aa bb cc dd" // 4 tokens: two overlapping 3-grams -> one merged span
    val corpus = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three ${span.toUpperCase} four"), // case-insensitive match
      (3L, "entirely unique singleton text with no shared grams at all")
    ).toDF("doc_id", "text")
    val out = Extensions16.stripDuplicateSpans(corpus, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    // both dup grams of the span mark starts; coverage merges them into
    // one 4-token span, stripped from each side, surroundings kept
    assert(out(1L) == (4L, "alpha beta gamma delta"), s"got ${out(1L)}")
    assert(out(2L) == (4L, "one two three four"), s"got ${out(2L)}")
    // the singleton survives byte-identical (n_removed 0, text unchanged)
    assert(out(3L) ==
      (0L, "entirely unique singleton text with no shared grams at all"))
  }

  test("x68 strips nothing when every doc is unique, everything shared when cloned") {
    import spark.implicits._
    val unique = Seq((1L, "q w e r t y u"), (2L, "z x c v b n m"))
      .toDF("doc_id", "text")
    val u = Extensions16.stripDuplicateSpans(unique, "doc_id", "text", n = 3)
      .agg(sum(col("n_removed"))).head().getLong(0)
    assert(u == 0L, "disjoint docs must lose nothing")
    val clones = Seq((1L, "same exact tokens here"), (2L, "same exact tokens here"))
      .toDF("doc_id", "text")
    val c = Extensions16.stripDuplicateSpans(clones, "doc_id", "text", n = 4)
      .collect().map(r => r.getAs[String]("clean_text"))
    assert(c.forall(_ == ""), "full clones are entirely covered spans")
  }

  test("x68 multi-width: the sub-gram span invisible at width 5 strips at {5,3}") {
    import spark.implicits._
    val short = "pp qq rr" // 3 tokens — no 5-gram fits inside it
    val corpus = Seq(
      (1L, s"alpha1 beta1 gamma1 $short delta1 epsilon1 zeta1"),
      (2L, s"alpha2 beta2 gamma2 $short delta2 epsilon2 zeta2")
    ).toDF("doc_id", "text")
    val single = Extensions16.stripDuplicateSpans(corpus, "doc_id", "text", n = 5)
      .agg(sum(col("n_removed"))).head().getLong(0)
    assert(single == 0L, "width 5 cannot see a 3-token shared span")
    val multi = Extensions16.stripDuplicateSpansMulti(
        corpus, "doc_id", "text", widths = Seq(5, 3))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(multi(1L) == (3L, "alpha1 beta1 gamma1 delta1 epsilon1 zeta1"),
      s"got ${multi(1L)}")
    assert(multi(2L) == (3L, "alpha2 beta2 gamma2 delta2 epsilon2 zeta2"),
      s"got ${multi(2L)}")
  }

  test("x68 single-width via the multi path is unchanged (Seq(n) delegation)") {
    import spark.implicits._
    val span = "aa bb cc dd"
    val corpus = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three $span four")).toDF("doc_id", "text")
    val a = Extensions16.stripDuplicateSpans(corpus, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Extensions16.stripDuplicateSpansMulti(corpus, "doc_id", "text", Seq(3))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  // ---- x69 -------------------------------------------------------------------

  /** Independent driver-side Sennrich BPE: word-frequency table, greedy
    * left-to-right pair replacement, (count desc, pair asc) selection.
    */
  private def refBpe(words: Map[String, Long], numMerges: Int): Seq[(Long, String, String, Long)] = {
    var w: Map[Vector[String], Long] =
      words.map { case (s, n) => s.split("").toVector -> n }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, n) <- w; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((k + 1L, l, r, n))
        w = w.toSeq.map { case (syms, cnt) =>
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              buf += (l + r); i += 2
            } else { buf += syms(i); i += 1 }
          }
          buf.toVector -> cnt
        }.groupMapReduce(_._1)(_._2)(_ + _)
        k += 1
      }
    }
    out.toSeq
  }

  test("x69 trainBpe matches an independent reference implementation on the fixture") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val wordFreq = d.select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refBpe(wordFreq, 12)
    val got = Extensions16.trainBpe(d, "text", numMerges = 12)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_n"))).toSeq
    assert(got == expected,
      s"merge lists diverge:\n got=$got\n exp=$expected")
    assert(got.length == 12)
  }

  test("x69 planted corpus: merges follow frequency order with deterministic ties") {
    import spark.implicits._
    // "ababab" x3 + "cd" x1: pair counts ab=9? No — within-word adjacent
    // pairs of 'ababab': ab(3), ba(2) per occurrence, times 3 words.
    val corpus = Seq((1L, "ababab ababab ababab cd")).toDF("doc_id", "text")
    val got = Extensions16.trainBpe(corpus, "text", numMerges = 2)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (a,b) count 9 beats (b,a) count 6. After merging, words are
    // [ab ab ab]; round 2: (ab,ab) count 6 (two adjacent pairs per word x3).
    assert(got == Seq(("a", "b", 9L), ("ab", "ab", 6L)), s"got $got")
  }

  // ---- x70 -------------------------------------------------------------------

  test("x70 recall eval runs over the partition-pruned store read") {
    val df = Extensions16.x70IvfStoreRecall(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 10, "one recall row per query")
    assert(rows.forall { r =>
      val rec = r.getAs[Double]("recall"); rec >= 0.0 && rec <= 1.0 })
    // the serving path under evaluation must be the pruned one: the plan
    // reads only probed cell directories, not the whole index
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+ IN \\(".r.findFirstIn(plan).isDefined,
      s"recall eval must read the store with cell partition pruning:\n$plan")
    // probes=2, queries=10, cells=8: IVF recall on clustered fixture data
    // should find at least some true neighbors overall
    assert(rows.map(_.getAs[Long]("n_hit")).sum > 0, "IVF store found zero true neighbors")
  }
}
