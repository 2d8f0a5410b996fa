package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass implementation behind [[RepetitionMetrics]] — a plain static
  * method so the generated code can call it directly (one invocation per
  * row keeps the surrounding operators inside whole-stage codegen; the loop
  * itself is ordinary JVM code over one hash map, not per-element
  * interpreted lambda evaluation).
  *
  * Every step replays the HOF reference formulation
  * ([[graft.ops.Extensions3.repetitionMetrics]]) exactly:
  * `lower` via UTF8String.toLowerCase (Spark's own lower()), tokenize via
  * `split(" ", -1)` (Spark's split keeps trailing empties), gram identity
  * via the space-joined token window (injective — tokens cannot contain
  * the separator), rounding via BigDecimal HALF_UP at scale 4 (Spark's
  * round). A spec asserts the two forms bit-identical.
  */
object RepetitionMetricsImpl {
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(text: UTF8String, dupN: Int, topN: Int): InternalRow = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val n = toks.length
    val tokSet = new java.util.HashSet[String](Math.max(16, n * 2))
    var i = 0
    while (i < n) { tokSet.add(toks(i)); i += 1 }
    val dupTokFrac = round4(1.0 - tokSet.size.toDouble / n)

    // (gramCount, distinctCount, maxFrequency) for the g-gram window
    def gramStats(g: Int): (Int, Int, Int) =
      if (n < g) (0, 0, 0)
      else {
        val m = new java.util.HashMap[String, Integer](Math.max(16, n * 2))
        var maxC = 0
        val sb = new java.lang.StringBuilder
        var s = 0
        while (s + g <= n) {
          sb.setLength(0)
          var j = 0
          while (j < g) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j)); j += 1
          }
          val c = m.merge(sb.toString, Integer.valueOf(1),
            (a: Integer, b: Integer) => Integer.valueOf(a + b))
          if (c > maxC) maxC = c
          s += 1
        }
        (n - g + 1, m.size, maxC)
      }

    val (dn, dd, _) = gramStats(dupN)
    val (tn, _, tm) = gramStats(topN)
    val dupGramFrac = if (dn > 0) round4(1.0 - dd.toDouble / dn) else 0.0
    val topGramFrac = if (tn > 0) round4(tm.toDouble / tn) else 0.0
    new GenericInternalRow(Array[Any](n.toLong, dupTokFrac, dupGramFrac, topGramFrac))
  }
}

/** Native Catalyst expression for the Gopher-style intra-document
  * repetition metrics over a text column, as one
  * struct<n_tok, dup_tok_frac, dup_gram_frac, top_gram_frac>.
  *
  * The HOF reference form stays in [[graft.ops.Extensions3]], but it pays
  * interpreted lambda evaluation per array element AND materializes every
  * gram window as a fresh string array per row — measured 20.7s for x22 at
  * sf0.1 under an honest (noop-sink) bench, the single most expensive
  * query in the suite. This expression computes all four metrics in one
  * pass per document with a single hash map, called as one static method
  * from generated code so the enclosing stage stays codegen-fused.
  */
case class RepetitionMetrics(child: Expression, dupN: Int, topN: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("dup_tok_frac", DoubleType, nullable = false),
    StructField("dup_gram_frac", DoubleType, nullable = false),
    StructField("top_gram_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (dupN < 1 || topN < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName gram sizes must be >= 1, got dupN=$dupN topN=$topN")
    else if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(t: Any): Any =
    RepetitionMetricsImpl.compute(t.asInstanceOf[UTF8String], dupN, topN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RepetitionMetricsImpl.compute($t, $dupN, $topN);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_metrics"
}

/** Column-level API for the native text expressions. */
object TextFunctions {
  /** All four repetition metrics of a text column in one codegen'd pass. */
  def repetition_metrics(text: Column, dupN: Int = 5, topN: Int = 2): Column =
    GraftSqlBridge.column(RepetitionMetrics(
      GraftSqlBridge.expression(text), dupN, topN))
}
