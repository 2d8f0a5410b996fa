package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions80

/** Batch-80 invariants: Wilson brackets a hand-computed interval and
  * stays inside [0,1] at the boundaries; the overlap matrix reads
  * disjoint, nested, and partial audiences exactly.
  */
class Extensions80Spec extends SparkSpec {

  private def ev(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_type")
  }

  test("x192 planted: hand-checked interval; 100% adoption keeps hi at 1") {
    // 20 users; 10 did "a"; all did "b"
    val rows = (1L to 20L).map(u => (u, "b")) ++
      (1L to 10L).map(u => (u, "a"))
    val out = Extensions80.wilsonProportions(ev(rows: _*), "event_type",
      "user_id").collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 20 && a.getLong(2) == 10 && a.getDouble(3) == 0.5)
    // Wilson 95% for 10/20: ~ [0.299, 0.701]
    assert(a.getDouble(4) > 0.27 && a.getDouble(4) < 0.32, s"$a")
    assert(a.getDouble(5) > 0.68 && a.getDouble(5) < 0.73, s"$a")
    val b = out("b")
    assert(b.getDouble(3) == 1.0 && b.getDouble(5) == 1.0 &&
      b.getDouble(4) > 0.8, s"full adoption: $b")
  }

  test("x193 planted: disjoint reads 0; nested reads containment 1") {
    // a: users 1-10; b: users 11-20 (disjoint); c: users 1-5 (inside a)
    val rows = (1L to 10L).map(u => (u, "a")) ++
      (11L to 20L).map(u => (u, "b")) ++
      (1L to 5L).map(u => (u, "c"))
    val out = Extensions80.audienceOverlap(ev(rows: _*), "event_type",
      "user_id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(!out.contains(("a", "b")), "disjoint pairs never materialize")
    val ac = out(("a", "c"))
    assert(ac.getLong(4) == 5 && ac.getDouble(5) == 0.5,
      s"jaccard 5/10: $ac")
    assert(ac.getDouble(7) == 1.0, s"c inside a: containment_c = 1: $ac")
    assert(ac.getDouble(6) == 0.5)
  }

  test("x192/x193 fixtures: intervals bracket rates; matrix complete for 5 types") {
    val w = SparkEntry.queries("x192_wilson")(spark, sf0001).collect()
    assert(w.length == 5)
    w.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(5),
        s"lo <= rate <= hi: $r")
    }
    val m = SparkEntry.queries("x193_audience_overlap")(spark, sf0001)
      .collect()
    assert(m.length == 10, "C(5,2) pairs, all overlapping on this fixture")
    m.foreach(r => assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0))
  }
}
