package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions33

/** Batch-33 invariants beyond the value-level oracle. */
class Extensions33Spec extends SparkSpec {

  test("x106 planted risk: unique combos are risky, big classes are safe, k_anonymity = min class") {
    import spark.implicits._
    // class (a,1): 10 rows (safe at k=5); (b,2): 3 rows (risky);
    // (c,3): 1 row (risky, and the k-anonymity level)
    val rows = Seq.fill(10)(("a", 1)) ++ Seq.fill(3)(("b", 2)) :+ (("c", 3))
    val df = rows.toDF("q1", "q2")
    val r = Extensions33.kAnonymityReport(df, Seq("q1", "q2"), k = 5).head()
    assert(r.getAs[Long]("n_rows") == 14L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_risky_rows") == 4L)
    assert(r.getAs[Double]("risk_frac") == 0.2857)
    assert(r.getAs[Long]("k_anonymity") == 1L)
  }

  test("x106 full-anonymity edge: one giant class has zero risk and k = n") {
    import spark.implicits._
    val df = Seq.fill(40)(("same", "combo")).toDF("q1", "q2")
    val r = Extensions33.kAnonymityReport(df, Seq("q1", "q2"), k = 5).head()
    assert(r.getAs[Long]("n_risky_rows") == 0L && r.getAs[Double]("risk_frac") == 0.0)
    assert(r.getAs[Long]("k_anonymity") == 40L)
  }
}
