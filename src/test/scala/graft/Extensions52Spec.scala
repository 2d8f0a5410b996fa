package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions52

/** Batch-52 invariants: CUSUM peaks exactly at a planted level shift
  * and telescopes to zero; the contamination scanner counts planted
  * residue exactly and stays quiet on clean text.
  */
class Extensions52Spec extends SparkSpec {

  test("x136 planted: a level shift at day 10 peaks the CUSUM there, exactly -50.00") {
    import spark.implicits._
    val rows = (1 to 20).map { d =>
      (f"2024-03-$d%02d 12:00:00", if (d <= 10) 10.0 else 20.0)
    }
    val ev = rows.toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
    val out = Extensions52.cusumChangepoint(ev, "ts", "value").collect()
    assert(out.length == 20)
    val cp = out.filter(_.getBoolean(3))
    assert(cp.length == 1 && cp.head.getString(0) == "2024-03-10",
      s"changepoint at the shift boundary: ${cp.toSeq}")
    assert(cp.head.getDouble(2) == -50.0, s"C_10 = 10·(10−15) = −50: ${cp.head}")
  }

  test("x136 planted: a flat series flags the first period with cusum 0 everywhere") {
    import spark.implicits._
    val ev = (1 to 5).map(d => (f"2024-03-$d%02d 12:00:00", 7.0))
      .toDF("ts0", "value")
      .select(to_timestamp(col("ts0")).as("ts"), col("value"))
    val out = Extensions52.cusumChangepoint(ev, "ts", "value").collect()
    assert(out.forall(_.getDouble(2) == 0.0))
    assert(out.head.getBoolean(3) && out.tail.forall(!_.getBoolean(3)),
      "tie -> earliest period flagged")
  }

  test("x136 fixture: exactly one changepoint; the CUSUM telescopes to zero") {
    val out = SparkEntry.queries("x136_cusum")(spark, sf0001).collect()
    assert(out.count(_.getBoolean(3)) == 1)
    assert(out.last.getDouble(2) == 0.0, "C_N = N·total − N·total = 0 exactly")
  }

  test("x137 planted: exact counts per family; clean text stays silent") {
    import spark.implicits._
    val docs = Seq(
      "please select and join the tables",       // 2 sql hits
      "<div> hello </div> plain words",          // 2 markup hits
      "greetings {{name}} from {{city}}",        // 2 template hits
      "x " + "a1b2c3d4" * 6,                     // one 48-char base64-ish run
      "perfectly ordinary clean text")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Extensions52.contaminationScan(docs, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("sql_keywords") == ((1L, 2L, 0.2)))
    assert(out("html_markup") == ((1L, 2L, 0.2)))
    assert(out("template_braces") == ((1L, 2L, 0.2)))
    assert(out("base64_blob") == ((1L, 1L, 0.2)))
  }

  test("x137 fixture: the synthetic corpus is saturated with SQL vocabulary, nothing else") {
    val out = SparkEntry.queries("x137_contamination")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("sql_keywords") > 0.9, s"got $out")
    assert(out("html_markup") == 0.0 && out("template_braces") == 0.0
      && out("base64_blob") == 0.0)
  }
}
