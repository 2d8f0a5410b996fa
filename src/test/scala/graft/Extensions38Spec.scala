package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions38

/** Batch-38 invariants: attribution credits exactly the planted
  * timeline under all three models, and credit is conserved (every
  * model distributes 1e6 micro per attributed conversion).
  */
class Extensions38Spec extends SparkSpec {

  private def ts(s: String) = s"2024-01-$s 00:00:00"

  test("x113 planted timeline: first/last/linear land exactly; post-conversion touches do not leak backward") {
    import spark.implicits._
    // user 1: click(d1), view(d2), purchase(d3)  -> conv 1: touches {click, view}
    //         view(d4), purchase(d5)             -> conv 2: touches {view}
    //         click(d6)                          -> dangling touch, attributed nowhere
    // user 2: purchase(d1)                       -> conv with NO touches: no credit rows
    val ev = Seq(
      (1L, "click", ts("01"), 101L), (1L, "view", ts("02"), 102L),
      (1L, "purchase", ts("03"), 103L),
      (1L, "view", ts("04"), 104L), (1L, "purchase", ts("05"), 105L),
      (1L, "click", ts("06"), 106L),
      (2L, "purchase", ts("01"), 201L))
      .toDF("u", "t", "ts_s", "ord").withColumn("ts", to_timestamp(col("ts_s")))
    val out = Extensions38.attribution(ev, "u", "t", "ts", "ord",
        convType = "purchase", touchTypes = Seq("click", "view"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // conv 1: first=click, last=view, linear 0.5/0.5; conv 2: view only
    assert(out(("first", "click")) == ((1000000L, 1L)))
    assert(out(("first", "view")) == ((1000000L, 1L)))
    assert(out(("last", "click")) == ((0L, 0L)))
    assert(out(("last", "view")) == ((2000000L, 2L)))
    assert(out(("linear", "click")) == ((500000L, 1L)))
    assert(out(("linear", "view")) == ((1500000L, 2L)), s"got $out")
    // conservation: each model distributes exactly 1e6 per attributed conv
    Seq("first", "last", "linear").foreach { m =>
      val total = out.collect { case ((`m`, _), (c, _)) => c }.sum
      assert(total == 2000000L, s"$m credit must sum to 2 conversions: $total")
    }
  }

  test("x113 fixture: 6 rows, models agree on total credit, deterministic") {
    val out = SparkEntry.queries("x113_attribution")(spark, sf0001).collect()
    assert(out.length == 6)
    val byModel = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byModel("first") == byModel("last"),
      s"first and last attribute the same conversion set: $byModel")
    // linear differs only by half-away rounding (±1 micro per touch)
    assert(math.abs(byModel("linear") - byModel("first")) <
      byModel("first") / 1000L, s"linear conserves credit to rounding: $byModel")
    val again = SparkEntry.queries("x113_attribution")(spark, sf0001).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
