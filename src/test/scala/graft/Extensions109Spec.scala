package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions109

/** Batch-109 invariants: the upcaster composes stepwise (a v1 payload
  * crosses EVERY migration, a current one crosses none); dead-letter
  * routing gives each row exactly one deterministic verdict and loses
  * nothing.
  */
class Extensions109Spec extends SparkSpec {

  test("upcastJson: v1 flows through the whole chain, v3 unchanged, values preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7}"""),
      (2L, """{"val": 8}"""),
      (3L, """{"val": 9, "unit": "u"}""")).toDF("id", "props")
    val up = Extensions109.upcastJson(df, "props", Seq(
      ((c: org.apache.spark.sql.Column) => get_json_object(c, "$.k").isNotNull,
        (c: org.apache.spark.sql.Column) =>
          concat(lit("""{"val": """), get_json_object(c, "$.k"), lit("}"))),
      ((c: org.apache.spark.sql.Column) => get_json_object(c, "$.unit").isNull,
        (c: org.apache.spark.sql.Column) =>
          concat(lit("""{"val": """), get_json_object(c, "$.val"),
            lit(""", "unit": "u"}""")))))
      .select(col("id"),
        get_json_object(col("props"), "$.val").cast("long").as("v"),
        get_json_object(col("props"), "$.unit").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(up == Set((1L, 7L, "u"), (2L, 8L, "u"), (3L, 9L, "u")),
      s"every generation lands on the latest schema: $up")
  }

  test("routeDeadLetters: first failing rule wins, clean rows read null, nothing lost") {
    import spark.implicits._
    val df = Seq((1L, "ok", 5.0), (2L, "bad", -1.0), (3L, "bad", 2.0))
      .toDF("id", "tag", "value")
    val routed = Extensions109.routeDeadLetters(df, Seq(
      "tagged_bad" -> (col("tag") =!= "bad"),
      "negative" -> (col("value") >= 0)))
    val got = routed.select(col("id"), col("dlq_reason"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some("tagged_bad"), 3L -> Some("tagged_bad")),
      s"row 2 fails BOTH rules but reads only the first: $got")
    assert(routed.count() == 3, "routing drops nothing")
  }

  test("x249/x250 fixtures: sane shapes") {
    val up = SparkEntry.queries("x249_upcast_card")(spark, sf0001).collect()
    assert(up.map(_.getLong(1)).sum == 1000L)
    assert(up.forall(r => r.getLong(5) == r.getLong(1)),
      "after upcast EVERY row must read the latest schema")
    val dl = SparkEntry.queries("x250_dead_letter_card")(spark, sf0001).collect()
    val m = dl.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.values.sum == 1000L && m.contains("bad_json") && m.contains("ok"))
    assert(m("bad_json") == 12L, s"events 0, 89, ... 979 are planted bad: $m")
  }
}
