package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Bit-parity contract for the native one-pass hashed-feature kernel
  * (r14): `md5_bucket_counts(tokens, F)` must equal the composable
  * HOF form it replaced —
  * concat(transform(sequence(0,F-1), j -> size(filter(bks, b -> b=j))), [1])
  * over bks = transform(tokens, t -> pmod(md5_bucket60(t), F)) —
  * on every input shape the tokenizer can produce (empty arrays,
  * empty-string tokens from split's kept trailing fields, nulls,
  * multi-byte text), so the x94-family oracle replays cannot drift.
  */
class BucketCountsSpec extends SparkSpec {
  import spark.implicits._

  private val F = 32

  private def composable(tokens: org.apache.spark.sql.Column) = {
    val bks = transform(tokens,
      t => pmod(HashFunctions.md5_bucket60(t), lit(F.toLong)))
    concat(
      transform(sequence(lit(0), lit(F - 1)),
        j => size(filter(bks, b => b === j.cast("long"))).cast("long")),
      array(lit(1L)))
  }

  test("native kernel ≡ composable HOF form on adversarial token arrays") {
    val rows = Seq(
      Seq("the", "a", "quick", "the", ""),
      Seq.empty[String],
      Seq(""),
      Seq("日本語", "tökens", "🎲🎲", "a b"), // multi-byte + space inside
      (0 until 500).map(i => s"tok$i"),
      Seq("x")
    ).toDF("tk")
    val both = rows.select(
      HashFunctions.md5_bucket_counts(col("tk"), F).as("native"),
      composable(col("tk")).as("ref"))
    val bad = both.filter(not(col("native") === col("ref"))).count()
    assert(bad == 0, "native bucket counts diverged from the HOF form")
  }

  test("null tokens count toward no bucket; bias stays 1") {
    val rows = Seq(Tuple1(Seq[String]("a", null, "b", null)))
      .toDF("tk")
    val both = rows.select(
      HashFunctions.md5_bucket_counts(col("tk"), F).as("native"),
      composable(col("tk")).as("ref")).collect()(0)
    assert(both.getSeq[Long](0) == both.getSeq[Long](1))
    assert(both.getSeq[Long](0).sum == 3L) // 2 counted tokens + bias
  }

  test("split-driven end-to-end: hashedFeatures x vector matches the replayed form") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, ""),
      (3L, "trailing space "),
      (4L, (0 until 200).map(i => s"w${i % 13}").mkString(" "))
    ).toDF("doc_id", "text")
    val viaOp = graft.ops.Extensions26
      .hashedFeatures(docs.withColumn("keep", lit(true)), "doc_id", "text", "keep")
      .select(col("doc_id"), col("x"))
    val ref = docs.select(col("doc_id"),
      composable(split(lower(col("text")), " ")).as("x"))
    val joined = viaOp.as("a").join(ref.as("b"), Seq("doc_id"))
      .filter(not(col("a.x") === col("b.x")))
    assert(joined.count() == 0)
  }
}
