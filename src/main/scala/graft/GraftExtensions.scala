package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSimilarity, JaroWinkler, LongDotProduct, Md5Bucket60, Md5Pair60, RepetitionMetrics}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions into the SQL function registry so `spark.sql` users get them
  * too. Wire with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  * or `spark.sql.extensions=graft.GraftExtensions` in config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimilarityFn)
    e.injectFunction(GraftExtensions.repetitionMetricsFn)
    e.injectFunction(GraftExtensions.md5Bucket60Fn)
    e.injectFunction(GraftExtensions.md5Pair60Fn)
    e.injectFunction(GraftExtensions.jaroWinklerFn)
    e.injectFunction(GraftExtensions.longDotFn)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPruning)
  }
}

object GraftExtensions {
  private val cosineSimilarityFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
      CosineSimilarity(exprs.head, exprs(1))
    })

  private val repetitionMetricsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("repetition_metrics"),
    new ExpressionInfo(classOf[RepetitionMetrics].getName, "repetition_metrics"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1 || exprs.length == 3,
        "repetition_metrics takes (text) or (text, dupN, topN)")
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"repetition_metrics $what must be an integer literal, got $other")
      }
      if (exprs.length == 1) RepetitionMetrics(exprs.head, 5, 2)
      else RepetitionMetrics(exprs.head,
        intLit(exprs(1), "dupN"), intLit(exprs(2), "topN"))
    })

  private val md5Bucket60Fn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_bucket60"),
    new ExpressionInfo(classOf[Md5Bucket60].getName, "md5_bucket60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "md5_bucket60 takes exactly 1 argument")
      Md5Bucket60(exprs.head)
    })

  private val md5Pair60Fn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_pair60"),
    new ExpressionInfo(classOf[Md5Pair60].getName, "md5_pair60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "md5_pair60 takes exactly 1 argument")
      Md5Pair60(exprs.head)
    })

  private val longDotFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("long_dot"),
    new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "long_dot takes exactly 2 arguments")
      LongDotProduct(exprs.head, exprs(1))
    })

  private val jaroWinklerFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "jaro_winkler takes exactly 2 arguments")
      JaroWinkler(exprs.head, exprs(1))
    })

  /** Register the functions on an already-running session (getOrCreate
    * ignores withExtensions for existing sessions).
    */
  def register(spark: SparkSession): Unit =
    Seq(cosineSimilarityFn, repetitionMetricsFn, md5Bucket60Fn,
        md5Pair60Fn, jaroWinklerFn, longDotFn).foreach { fn =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, fn._1, fn._2, fn._3)
    }
}
