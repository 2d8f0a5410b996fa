package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.long_dot

/** LongDotProduct must be value-identical to the HOF reference form it
  * replaced in every quantized brute scorer — a drift here silently
  * moves x241/x283/x290/x292/x94-family results.
  */
class LongDotSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0L), _ + _)

  test("property: equals the aggregate(zip_with) reference on arbitrary long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Array.fill(n)(rnd.nextLong() % 1000000L),
        Array.fill(n)(rnd.nextLong() % 1000000L))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(long_dot(col("a"), col("b")).as("nd"),
        hofDot(col("a"), col("b")).as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != HOF ${r.getLong(1)}"))
  }

  test("codegen and interpreted paths agree; empty and singleton arrays work") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array(7L), Array(-3L)),
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    val viaPlan = df.select(long_dot(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq
    assert(viaPlan == Seq(0L, -21L, 32L))
    // interpreted path directly
    val e = graft.functions.LongDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4L, 5L, 6L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 32L)
  }

  test("long_dot is registered for SQL users") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Array(2L, 3L), Array(10L, 100L))).toDF("a", "b")
      .createOrReplaceTempView("ld_t")
    val got = spark.sql("SELECT long_dot(a, b) FROM ld_t").collect()(0).getLong(0)
    assert(got == 320L)
  }
}
