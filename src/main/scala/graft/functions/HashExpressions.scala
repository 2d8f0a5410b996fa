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

/** Column-level API for the native hash expressions. */
object HashFunctions {
  /** 60-bit md5 bucket of a string column as a codegen'd long. */
  def md5_bucket60(c: Column): Column =
    GraftSqlBridge.column(Md5Bucket60(GraftSqlBridge.expression(c)))
}
