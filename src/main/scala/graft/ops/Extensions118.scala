package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** One-hundred-eighteenth extension batch:
  *
  * Theil–Sen robust trend (x266): the median-of-pairwise-slopes
  * estimator (Theil 1950, Sen 1968) next to the least-squares fits the
  * repo already ships (x156 ITS segments, x179 drift/seasonal
  * baselines) — a single outlier day can move an OLS slope arbitrarily;
  * Theil–Sen has a 29.3% breakdown point. Exactness discipline: slopes
  * stay RATIONALS (num, den) — the median is selected by rank over
  * (exact-double value, num, den) where the double is one IEEE division
  * of the same two integers in both engines and the integer pair breaks
  * any double tie — and only the SELECTED median renders to micro via
  * the sign-symmetric half-up form. Lower median for even counts (no
  * rational averaging). Intercept = lower median of the per-point
  * residuals y − slope·t, same discipline over den-scaled integers.
  *
  * Scale shape: the estimator is quadratic in SERIES POINTS by
  * definition — the input contract is an aggregated series (days,
  * buckets), so the pair table is grid²-sized, never corpus-sized; one
  * rank over it selects the median.
  */
object Extensions118 {

  /** One-row Theil–Sen fit of (`tCol` integer, `yCentsCol`): (n_points,
    * n_pairs, slope_micro, intercept_micro_cents).
    */
  def theilSen(
      series: DataFrame, tCol: String, yCentsCol: String): DataFrame = {
    val pts = Extensions.materialized(
      series.select(col(tCol).cast("long").as("t"),
        col(yCentsCol).cast("long").as("y")))
    val pairs = pts.as("a").join(pts.as("b"), col("a.t") < col("b.t"))
      .select((col("b.y") - col("a.y")).as("num"),
        (col("b.t") - col("a.t")).as("den"))
    val ranked = pairs
      .withColumn("v", col("num").cast("double") / col("den").cast("double"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("v"), col("num"), col("den"))))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(lit(1))))
    val med = ranked.filter(col("rk") === expr("(np + 1) DIV 2"))
      .select(col("num"), col("den"), col("np"))
    // residuals against the selected rational slope: r = y·den − num·t
    // (den-scaled cents; den > 0 keeps the order)
    val resid = pts.crossJoin(broadcast(med))
      .select((col("y") * col("den") - col("num") * col("t")).as("rn"),
        col("den"), col("num"), col("np"))
    val nPts = Window.partitionBy(lit(1))
    val medResid = resid
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rn"), col("den"))))
      .withColumn("n", count(lit(1)).over(nPts))
      .filter(col("rk") === expr("(n + 1) DIV 2"))
    medResid.select(
      col("n").as("n_points"), col("np").as("n_pairs"),
      expr("""CAST(CASE WHEN num >= 0
           THEN (2 * 1000000 * CAST(num AS DECIMAL(38,0)) + den) DIV (2 * CAST(den AS DECIMAL(38,0)))
           ELSE -((2 * 1000000 * CAST(-num AS DECIMAL(38,0)) + den) DIV (2 * CAST(den AS DECIMAL(38,0)))) END AS BIGINT)""")
        .as("slope_micro"),
      expr("""CAST(CASE WHEN rn >= 0
           THEN (2 * 1000000 * CAST(rn AS DECIMAL(38,0)) + den) DIV (2 * CAST(den AS DECIMAL(38,0)))
           ELSE -((2 * 1000000 * CAST(-rn AS DECIMAL(38,0)) + den) DIV (2 * CAST(den AS DECIMAL(38,0)))) END AS BIGINT)""")
        .as("intercept_micro_cents"))
  }

  /** x266: robust daily-revenue trend — day index from the epoch day,
    * y = per-day purchase cents (the x262 series, fitted instead of
    * split).
    */
  def x266TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr(
        "unix_micros(date_trunc('DAY', ts)) DIV 86400000000").as("t"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
    theilSen(daily, "t", "y")
  }

  private val x266OracleSql: String = """
      WITH daily AS (
        SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS t,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      pairs AS (
        SELECT b.y - a.y AS num, b.t - a.t AS den
        FROM daily a JOIN daily b ON a.t < b.t),
      ranked AS (
        SELECT num, den,
               row_number() OVER (ORDER BY
                 CAST(num AS DOUBLE) / CAST(den AS DOUBLE), num, den) AS rk,
               count(*) OVER () AS np
        FROM pairs),
      med AS (SELECT num, den, np FROM ranked WHERE rk = (np + 1) // 2),
      resid AS (
        SELECT d.y * m.den - m.num * d.t AS rn, m.den, m.num, m.np
        FROM daily d, med m),
      mr AS (
        SELECT *, row_number() OVER (ORDER BY rn, den) AS rk,
               count(*) OVER () AS n
        FROM resid)
      SELECT CAST(n AS BIGINT) AS n_points, CAST(np AS BIGINT) AS n_pairs,
             CAST(CASE WHEN num >= 0
               THEN (2 * 1000000 * CAST(num AS HUGEINT) + den) // (2 * CAST(den AS HUGEINT))
               ELSE -((2 * 1000000 * CAST(-num AS HUGEINT) + den) // (2 * CAST(den AS HUGEINT)))
               END AS BIGINT) AS slope_micro,
             CAST(CASE WHEN rn >= 0
               THEN (2 * 1000000 * CAST(rn AS HUGEINT) + den) // (2 * CAST(den AS HUGEINT))
               ELSE -((2 * 1000000 * CAST(-rn AS HUGEINT) + den) // (2 * CAST(den AS HUGEINT)))
               END AS BIGINT) AS intercept_micro_cents
      FROM mr WHERE rk = (n + 1) // 2"""

  val oracles: Map[String, String] = Map(
    "x266_theil_sen" -> x266OracleSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x266_theil_sen" -> (x266TheilSen _))
}
