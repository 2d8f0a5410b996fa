package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions36

/** Batch-36 invariants: the scrub redacts what it claims (and nothing
  * else) in pattern order; the mSPRT monitor fires on a planted effect
  * and stays quiet on a null.
  */
class Extensions36Spec extends SparkSpec {

  test("x109 planted PII: every category redacts, counts are per-category, clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact jane.doe@corp.example and bob@x.io or 555-1234"),
      (2L, "ids 1234567 and 987654321 plus short 12345"),
      (3L, "perfectly clean prose with no identifiers at all"),
      (4L, "mixed a@b.co then 321-9999 then 777777777"))
      .toDF("doc_id", "text")
    val out = Extensions36.piiScrub(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) == (("contact <EMAIL> and <EMAIL> or <PHONE>", 2L, 1L, 0L, 3L)))
    assert(out(2L) == (("ids <NUM> and <NUM> plus short 12345", 0L, 0L, 2L, 2L)),
      s"6+ digit runs only: ${out(2L)}")
    assert(out(3L) == (("perfectly clean prose with no identifiers at all", 0L, 0L, 0L, 0L)))
    assert(out(4L) == (("mixed <EMAIL> then <PHONE> then <NUM>", 1L, 1L, 1L, 3L)))
  }

  test("x109 ordering: an email's digits are not double-counted as digit runs") {
    import spark.implicits._
    val out = Extensions36.piiScrub(
        Seq((1L, "mail 123456789@example.com end")).toDF("doc_id", "text"),
        "doc_id", "text")
      .head()
    assert(out.getString(1) == "mail <EMAIL> end")
    assert(out.getLong(2) == 1L && out.getLong(4) == 0L,
      s"email first, so no digit-run count: $out")
  }

  test("x110 planted effect: treatment lift drives log_lambda up and p down; null effect stays insignificant") {
    import spark.implicits._
    // md5-permille arms: find user ids landing in each arm, then plant
    // a mean shift on the treatment arm only
    def arm(u: Long): String =
      if (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(u.toString).take(15), 16) % 2 == 0)
        "control" else "treatment"
    val users = (1L to 400L)
    def mk(lift: Double) = users.map { u =>
      val base = 50.0 + (u % 7)
      val v = if (arm(u) == "treatment") base + lift else base
      (u, "2024-01-20 00:00:00", v)
    }.toDF("user_id", "ts_s", "value").withColumn("ts", to_timestamp(col("ts_s")))
    val hot = Extensions36.msprtReadout(mk(40.0), "user_id", "ts", "value",
      "2024-01-16 00:00:00").head()
    val cold = Extensions36.msprtReadout(mk(0.0), "user_id", "ts", "value",
      "2024-01-16 00:00:00").head()
    assert(hot.getAs[Double]("p_always_valid") < 0.05 && hot.getAs[Boolean]("significant_05"),
      s"planted 40-unit lift must be significant: $hot")
    assert(cold.getAs[Double]("p_always_valid") > 0.5 && !cold.getAs[Boolean]("significant_05"),
      s"null effect must stay quiet: $cold")
    assert(hot.getAs[Double]("delta") > 35.0 && hot.getAs[Double]("delta") < 45.0)
  }

  test("x110 fixture: arms partition post-period users; p in [0,1]; deterministic") {
    val out = SparkEntry.queries("x110_msprt")(spark, sf0001).head()
    val p = out.getAs[Double]("p_always_valid")
    assert(p >= 0.0 && p <= 1.0)
    val again = SparkEntry.queries("x110_msprt")(spark, sf0001).head()
    assert(out.toSeq == again.toSeq)
  }
}
