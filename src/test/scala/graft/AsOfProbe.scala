package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: measures the native as-of exec (q80 path) against the
  * union+window idiom (q11 path) on a deliberately skewed corpus — one hot
  * key carrying millions of right rows — where the two plans' state models
  * diverge: AsOfJoinExec streams the sorted partition with O(1) state (one
  * candidate row), while WindowExec materializes each key's growing frame
  * in its row buffer (spilling past the in-memory threshold). Same sort on
  * both sides; the delta is the buffer/spill cost.
  *
  * Clicks sit on even ts, purchases on odd ts, so "latest click <= ts" and
  * the window's "last click strictly before" agree and the two variants
  * must produce identical results (asserted via count + checksum).
  *
  * Run: sbt "Test/runMain graft.AsOfProbe [hotClicks] [hotPurchases]"
  */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val hotClicks = args.headOption.map(_.toLong).getOrElse(4000000L)
    val hotPurch = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // hot key 0 + 9 cold keys; clicks even ts, purchases odd ts
    val clicks = spark.range(hotClicks)
      .select(lit(0L).as("user_id"), (col("id") * 2).as("ts"), col("id").as("click_id"))
      .unionByName(spark.range(9000)
        .select((col("id") % 9 + 1).as("user_id"), (col("id") * 2).as("ts"),
          (col("id") + 900000000L).as("click_id")))
      .localCheckpoint(true)
    val purchases = spark.range(hotPurch)
      .select(col("id").as("event_id"), lit(0L).as("user_id"),
        (col("id") * (2 * hotClicks / hotPurch) + 1).as("ts"))
      .unionByName(spark.range(9000)
        .select((col("id") + 800000000L).as("event_id"),
          (col("id") % 9 + 1).as("user_id"), (col("id") * 2 + 1).as("ts")))
      .localCheckpoint(true)

    def native(): (Long, Long) = {
      val r = graft.api.Graft.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
        .agg(count(lit(1)), sum(col("click_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def windowIdiom(): (Long, Long) = {
      val ev = clicks.select(col("user_id"), col("ts"),
          col("click_id").as("event_id"), lit("click").as("event_type"))
        .unionByName(purchases.select(col("user_id"), col("ts"),
          col("event_id"), lit("purchase").as("event_type")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = ev.withColumn("prev_click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .agg(count(lit(1)), sum(col("prev_click_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    var checks = Set.empty[(Long, Long)]
    def best(name: String)(f: => (Long, Long)): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); checks += f; (System.nanoTime() - t0) / 1e9
      }
      println(f"min=${times.min}%6.2f  all=${times.map(t => f"$t%5.2f").mkString(",")}  $name")
    }
    println(s"hot key: $hotClicks clicks, $hotPurch purchases")
    best("A: native AsOfJoinExec (O(1) merge state)") { native() }
    best("B: union+window idiom (buffered frame)") { windowIdiom() }
    assert(checks.size == 1, s"variants disagree: $checks")
    println(s"results agree: (rows, checksum) = ${checks.head}")
    spark.stop()
  }
}
