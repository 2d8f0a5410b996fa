package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

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
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
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

  /** Register the functions on an already-running session (getOrCreate
    * ignores withExtensions for existing sessions).
    */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark, cosineSimilarityFn._1, cosineSimilarityFn._2, cosineSimilarityFn._3)
}
