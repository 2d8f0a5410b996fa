package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions5

/** Structural/quality invariants for the batch-5 operators (x38-x40) that
  * the value-level DuckDB oracle can't express: JL distance preservation,
  * int8 dequantization error bounds, classifier scale shape.
  */
class Extensions5Spec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("x38 quality classifier is map-only (no exchange) and score is bounded") {
    val df = Extensions5.hashedLinearScore(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hashedLinearScore must not shuffle — map-only classifier:\n$plan")
    val bad = df.filter(abs(col("score")) > 1.0).count()
    assert(bad == 0, "mean of [-1,1] weights cannot leave [-1,1]")
    // keep must agree with the sign of score (threshold 0)
    val disagree = df.filter(col("keep") =!= (col("score") > 0)).count()
    assert(disagree == 0, "keep flag must equal score > threshold")
  }

  test("x38 nonzero threshold: keep cutoff is per-doc score, not length-scaled") {
    import spark.implicits._
    // a long doc of weakly-positive tokens vs a short doc of strongly-
    // positive ones: with the cutoff wrongly compared against raw si, the
    // long doc would pass any threshold its length can buy
    val df = Extensions5.hashedLinearScore(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text",
      threshold = 0.05)
    // keep compares the EXACT integer si against threshold·1000·n; score
    // is rounded to 4 decimals — exclude the one representable boundary
    // bin where the rounded value can't distinguish the two sides
    val disagree = df.filter(abs(col("score") - 0.05) > 1e-4)
      .filter(col("keep") =!= (col("score") > 0.05)).count()
    assert(disagree == 0, "keep must equal score > threshold at nonzero threshold")
    // and the two regimes must actually differ on this corpus (otherwise
    // the assertion above is vacuous)
    val zeroKeeps = Extensions5.hashedLinearScore(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text")
      .filter(col("keep")).count()
    val thrKeeps = df.filter(col("keep")).count()
    assert(thrKeeps < zeroKeeps,
      s"raising the threshold must shrink the kept set ($thrKeeps !< $zeroKeeps)")
  }

  test("x39 JL projection preserves squared norms in expectation (E[|Px|^2] = |x|^2)") {
    val proj = Extensions5.jlProject(emb, "vec_id", "embedding", 16, 64)
      .groupBy("vec_id").agg(sum(col("value") * col("value")).as("pn2"))
    val orig = emb.select(col("vec_id"),
      aggregate(col("embedding").cast("array<double>"), lit(0.0d),
        (a, x) => a + x * x).as("n2"))
    val ratios = proj.join(orig, "vec_id")
      .select(avg(col("pn2") / col("n2")).as("mean_ratio"),
        count(lit(1)).as("n"))
      .head()
    val mean = ratios.getDouble(0)
    assert(ratios.getLong(1) == 500L)
    // 16 projected dims average 500 vectors: the mean ratio concentrates
    // hard around 1; [0.8, 1.25] is a > 5-sigma envelope
    assert(mean > 0.8 && mean < 1.25, s"norm ratio off: $mean")
  }

  test("x39 sign matrix is deterministic and balanced") {
    val signs = for (j <- 0 until 16; i <- 0 until 64) yield Extensions5.jlSign(j, i)
    assert(signs.forall(s => s == 1.0 || s == -1.0))
    val plus = signs.count(_ == 1.0)
    // md5 parity over 1024 cells: binomial(1024, 1/2), +-5 sigma = +-80
    assert(math.abs(plus - 512) < 80, s"sign matrix unbalanced: $plus/1024 positive")
    assert(Extensions5.jlSign(3, 7) == Extensions5.jlSign(3, 7))
  }

  test("x40 int8 dequantized cosine stays within 1% of the exact cosine") {
    val q = Extensions5.int8Quantize(emb, "vec_id", "embedding")
      .withColumn("deq", col("q") * col("scale") / 127.0d)
    // dequantized self-cosine against the original vector per id
    val o = emb.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
    val err = q.join(o, Seq("vec_id", "dim"))
      .groupBy("vec_id")
      .agg((sum(col("deq") * col("x")) /
        (sqrt(sum(col("deq") * col("deq"))) * sqrt(sum(col("x") * col("x")))))
        .as("cos"))
      .agg(min(col("cos"))).head().getDouble(0)
    assert(err > 0.99, s"worst dequantized self-cosine $err < 0.99")
  }

  test("x41 mixture shares: cum_share is monotone and ends at 1.0") {
    val rows = Extensions5.sourceMixtureStats(
        spark.read.parquet(s"$sf0001/documents.parquet"), "source", "text")
      .orderBy(col("rk")).collect()
    val cums = rows.map(r => r.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a }, "cum_share must be monotone")
    assert(math.abs(cums.last - 1.0) < 1e-9, s"last cum_share ${cums.last} != 1.0")
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to rows.length).toSeq)
  }

  test("x42 md5 sharding populates every shard and balances within 2x of uniform") {
    val rows = Extensions5.shardAssign(
        spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text", 8)
      .collect()
    assert(rows.length == 8, "every shard must receive documents")
    val counts = rows.map(_.getAs[Long]("n_docs"))
    // 500 docs over 8 shards: uniform = 62.5; md5 keeps shards inside [31, 125]
    assert(counts.max < 2 * counts.min,
      s"shard skew ${counts.min}..${counts.max} exceeds 2x")
  }

  test("x43 robust outliers: flag agrees with the med/mad cutoff it reports") {
    val df = Extensions5.robustOutliers(
      spark.read.parquet(s"$sf0001/documents.parquet"), "source", "n_chars")
    val bad = df.filter(
      col("is_outlier") =!=
        (abs(col("n_chars") - col("med")) > lit(3.0 * 1.4826) * col("mad"))).count()
    assert(bad == 0, "is_outlier must restate the reported med/mad cutoff")
    val flagged = df.filter(col("is_outlier")).count()
    val total = df.count()
    assert(flagged < total / 2, s"a robust filter cannot flag the majority ($flagged/$total)")
  }

  test("x44 bigram LM separates phrase-coherent text from unigram-identical shuffles") {
    import spark.implicits._
    // 20 docs of the dominant phrase pattern + 1 doc with the SAME token
    // multiset but scrambled order: a unigram model scores both equally,
    // the bigram model must score the scramble strictly worse
    val phrase = Seq.fill(10)("a b c d").mkString(" ")
    val scramble = Seq.fill(10)("a c b d").mkString(" ")
    val corpus = ((0 until 20).map(i => (i.toLong, phrase)) :+ (99L, scramble))
      .toDF("doc_id", "text")
    val ce = Extensions5.bigramScore(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("cross_entropy")).toMap
    assert(ce(99L) > ce(0L),
      s"scrambled doc must score worse: scramble=${ce(99L)} phrase=${ce(0L)}")
    val df = Extensions5.bigramScore(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text")
    assert(df.filter(col("cross_entropy") <= 0).count() == 0,
      "cross-entropy of an interpolated model (P < 1) is strictly positive")
  }

  test("x40 quantized values are int8-range and max-magnitude coordinate hits 127") {
    val q = Extensions5.int8Quantize(emb, "vec_id", "embedding")
    assert(q.filter(abs(col("q")) > 127).count() == 0, "values must fit int8")
    val hit = q.groupBy("vec_id").agg(max(abs(col("q"))).as("m"))
      .filter(col("m") =!= 127).count()
    assert(hit == 0, "symmetric quantization pins the max |coordinate| to 127")
  }
}
