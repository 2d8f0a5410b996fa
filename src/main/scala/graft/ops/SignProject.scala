package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared ±1 random-sign projection kernel (Achlioptas 2003) — the one
  * code path under x39/x247 ([[Extensions108.randomProjection]]) and
  * x330 ([[Extensions145.jlProjectionCard]]). The sign matrix is a pure
  * function of an md5 lane, so it materializes ONCE on the DRIVER (zero
  * coordination, zero storage, zero per-row hashing) and inlines as
  * literals: one map-only pass of native `long_dot` products under
  * codegen. The adapters differ only in their LANE (the md5 key layout,
  * which each oracle replays textually) and what they do with the
  * projected vectors.
  */
object SignProject {

  /** Driver-side twin of the portable 60-bit md5 hash
    * ([[graft.functions.HashFunctions.md5_bucket60]]): first 15 hex
    * chars of md5, parsed as a long — same formula, so SQL oracles
    * replay it.
    */
  private[ops] def md5bucket60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Append `outCol` = the `kDims`-component projection of the
    * quantized long-array column `vecCol` through the literal sign
    * matrix `signAt(j0, i0) ∈ {−1, +1}` (0-based output/input
    * indices). Every input vector must have exactly `inDims`
    * components.
    */
  def literalProject(
      df: DataFrame, vecCol: String, outCol: String,
      kDims: Int, inDims: Int, signAt: (Int, Int) => Long): DataFrame = {
    require(kDims >= 1 && inDims >= 1)
    val cols = (0 until kDims).map { j =>
      val signs = Seq.tabulate(inDims)(i => signAt(j, i))
      graft.functions.VectorFunctions.long_dot(col(vecCol), typedLit(signs))
    }
    df.withColumn(outCol, array(cols: _*))
  }
}
