package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 bucket: the engine-portable hash key the dedup /
  * sampling / sharding family is built on, computed directly from the
  * digest bytes.
  *
  * The composable form — `conv(substring(md5(x), 1, 15), 16, 10)` — is
  * kept as the reference (and is what every DuckDB oracle replays), but
  * it materializes a 32-char hex string, substrings it, and re-parses 15
  * hex chars through a generic base-converter PER ROW. This expression
  * takes the same 60 bits (first 7.5 digest bytes, big-endian) with
  * shifts — one digest, zero string round-trips — and fuses into
  * whole-stage codegen. On the MinHash signature path it runs once per
  * distinct (doc, shingle): the hottest hash site in the engine.
  *
  * Bit-identical to the conv form by construction (15 hex chars = the 60
  * high bits of the digest, always non-negative); asserted in
  * ExtensionsSpec so a swap can never drift an oracle-checked result.
  */
case class Md5Bucket60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(
      input.asInstanceOf[UTF8String].getBytes)
    Md5Bucket60.fold(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      s"""
        byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5($c.getBytes());
        ${ev.value} = graft.functions.Md5Bucket60.fold($d);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_bucket60"
}

object Md5Bucket60 {
  /** First 60 bits of the digest, big-endian — exactly the value of
    * `('0x' || substr(md5_hex, 1, 15))::BIGINT`.
    */
  def fold(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** BOTH independent 60-bit values of one md5 digest — hex chars 1-15
  * and 16-30 — as a 2-element long array from a single digest pass.
  * The consumer that needs two deterministic uniforms per input (the
  * x273 Poisson-bootstrap replica pair) would otherwise hash twice or
  * round-trip the digest through a 32-char hex string and a generic
  * base parser per element; this computes both with shifts, one
  * digest, zero strings, fused into whole-stage codegen.
  *
  * Bit-identical to `('0x'||substr(md5(x),1,15))::BIGINT` and
  * `('0x'||substr(md5(x),16,15))::BIGINT` by construction (nibbles
  * 0-14 and 15-29 big-endian) — HashPairSpec asserts both lanes
  * against the composable conv form.
  */
case class Md5Pair60(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(
      input.asInstanceOf[UTF8String].getBytes)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(Md5Pair60.lane1(d), Md5Pair60.lane2(d)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      s"""
        byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5($c.getBytes());
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new long[]{graft.functions.Md5Pair60.lane1($d),
                     graft.functions.Md5Pair60.lane2($d)});
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_pair60"
}

object Md5Pair60 {
  /** Hex chars 1-15: digest nibbles 0-14 big-endian (= Md5Bucket60). */
  def lane1(d: Array[Byte]): Long = Md5Bucket60.fold(d)

  /** Hex chars 16-30: nibble 15 (low nibble of byte 7) then bytes 8-14. */
  def lane2(d: Array[Byte]): Long = {
    var v = (d(7) & 0x0fL)
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
}

/** Hashed-feature vector of a token array in ONE native pass: count of
  * tokens per 60-bit-md5 bucket (mod `numBuckets`), plus a trailing
  * bias 1 — exactly the value of
  * `concat(transform(sequence(0, F-1), j -> size(filter(bks, b -> b = j))), array(1))`
  * over `bks = transform(tokens, t -> pmod(md5_bucket60(t), F))`.
  *
  * The composable form pays F+1 interpreted HOF passes over the bucket
  * array per row (measured ~2.6 s of the x94-family featurization scan
  * at sf0.1 — the hottest map in the classifier tier, r14 optimization
  * round); this computes the whole count vector in one token loop with
  * one digest per token, called as a single static method from
  * generated code. Null tokens contribute to no bucket (the filter
  * predicate `b = j` is null for them), identically to the HOF form.
  * Bit-identical by construction — BucketCountsSpec asserts parity
  * against the composable form.
  */
case class Md5BucketCounts(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (numBuckets < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numBuckets >= 1, got $numBuckets")
    else child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5BucketCounts.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5BucketCounts.compute($c, $numBuckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_bucket_counts"
}

object Md5BucketCounts {
  /** One token loop: digest → 60-bit fold → bucket (the fold is always
    * non-negative, so `% F` IS `pmod`) → count, bias appended last.
    */
  def compute(
      tokens: org.apache.spark.sql.catalyst.util.ArrayData,
      numBuckets: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val counts = new Array[Long](numBuckets + 1)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          tokens.getUTF8String(i).getBytes)
        counts((Md5Bucket60.fold(d) % numBuckets).toInt) += 1L
      }
      i += 1
    }
    counts(numBuckets) = 1L
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }
}

/** Column-level API for the native hash expressions. */
object HashFunctions {
  /** 60-bit md5 bucket of a string column as a codegen'd long. */
  def md5_bucket60(c: Column): Column =
    GraftSqlBridge.column(Md5Bucket60(GraftSqlBridge.expression(c)))

  /** Both 60-bit md5 lanes of a string column as a codegen'd array. */
  def md5_pair60(c: Column): Column =
    GraftSqlBridge.column(Md5Pair60(GraftSqlBridge.expression(c)))

  /** Per-md5-bucket token counts + trailing bias 1, one codegen'd pass. */
  def md5_bucket_counts(tokens: Column, numBuckets: Int): Column =
    GraftSqlBridge.column(Md5BucketCounts(
      GraftSqlBridge.expression(tokens), numBuckets))
}
