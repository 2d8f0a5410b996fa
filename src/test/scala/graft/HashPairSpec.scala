package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFunctions.{md5_bucket60, md5_pair60}

/** Md5Pair60's two lanes must be bit-identical to the composable
  * hex-substring forms every DuckDB oracle replays — a drift here
  * silently breaks any oracle built on either lane.
  */
class HashPairSpec extends SparkSpec {

  test("property: both lanes equal the conv(substr(md5)) reference on arbitrary strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val strs = (1 to 300).map(_ =>
      rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) ++
      Seq("", "a", "0|1", "ünïcode-样本", " leading space")
    val df = strs.toDF("s")
    val got = df.select(col("s"),
        md5_pair60(col("s")).as("p"),
        md5_bucket60(col("s")).as("b60"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("r1"),
        conv(substring(md5(col("s")), 16, 15), 16, 10).cast("long").as("r2"))
      .collect()
    got.foreach { r =>
      val p = r.getSeq[Long](1)
      assert(p(0) == r.getLong(3),
        s"lane1 drift for '${r.getString(0)}': ${p(0)} vs ${r.getLong(3)}")
      assert(p(1) == r.getLong(4),
        s"lane2 drift for '${r.getString(0)}': ${p(1)} vs ${r.getLong(4)}")
      assert(p(0) == r.getLong(2), "lane1 must equal md5_bucket60")
      assert(p(0) >= 0L && p(1) >= 0L, "60-bit lanes stay non-negative")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("x", "yy", "zzz").toDF("s")
    val viaPlan = df.select(md5_pair60(col("s"))).collect()
      .map(_.getSeq[Long](0)).toSeq
    val direct = Seq("x", "yy", "zzz").map { s =>
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        s.getBytes("UTF-8"))
      Seq(graft.functions.Md5Pair60.lane1(d), graft.functions.Md5Pair60.lane2(d))
    }
    assert(viaPlan == direct)
  }

  test("md5_pair60 is registered for SQL users and both lanes match the oracle form") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT md5_pair60('hello') AS p,
                CAST(conv(substring(md5('hello'), 1, 15), 16, 10) AS LONG) AS r1,
                CAST(conv(substring(md5('hello'), 16, 15), 16, 10) AS LONG) AS r2""")
      .collect().head
    val p = r.getSeq[Long](0)
    assert(p(0) == r.getLong(1) && p(1) == r.getLong(2),
      s"SQL md5_pair60 drifted from the conv(substr(md5)) oracle form: $r")
  }
}
