package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions33, Extensions35}

/** k-anonymization fixer: planted small classes climb the ladder until
  * they reach k or suppress, every released class is ≥ k (risk_frac = 0
  * through the x106 audit), and the fixture release is k-anonymous.
  */
class Extensions35Spec extends SparkSpec {

  import org.apache.spark.sql.Column

  private def ladder(bal: Column): Seq[Seq[(String, Column)]] = Seq(
    Seq[(String, Column)](
      ("nation", col("n")), ("segment", col("seg")),
      ("bal_band", concat(lit("b100:"), floor(bal / 100).cast("long").cast("string")))),
    Seq[(String, Column)](
      ("nation", col("n")), ("segment", col("seg")),
      ("bal_band", concat(lit("b1000:"), floor(bal / 1000).cast("long").cast("string")))),
    Seq[(String, Column)](
      ("nation", col("n")), ("segment", col("seg")), ("bal_band", lit("*"))))

  test("planted ladder: rows release at the finest level reaching k; leftovers suppress; release risk is zero") {
    import spark.implicits._
    val rows =
      // 6 rows sharing one 100-band -> release at level 0
      (1L to 6L).map(i => (i, "A", "X", 100.0 + i)) ++
      // 5 rows in distinct 100-bands but one 1000-band -> level 1
      Seq((11L, 1210.0), (12L, 1320.0), (13L, 1440.0), (14L, 1550.0), (15L, 1660.0))
        .map { case (i, b) => (i, "B", "X", b) } ++
      // 3 rows that never reach k -> suppressed
      Seq((21L, 5000.0), (22L, 6100.0), (23L, 7200.0))
        .map { case (i, b) => (i, "C", "X", b) } ++
      // 5 rows distinct in every band -> only the '*' level reaches k
      Seq((31L, 100.0), (32L, 1100.0), (33L, 2100.0), (34L, 3100.0), (35L, 4100.0))
        .map { case (i, b) => (i, "D", "X", b) }
    val df = rows.toDF("id", "n", "seg", "bal")
    val out = Extensions35.kAnonymize(df, "id", ladder(col("bal")), k = 5)
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3), r.getLong(4))).toMap
    assert(byId.size == rows.size, "output must partition the input rows")
    (1L to 6L).foreach(i => assert(byId(i)._3 == 0L, s"row $i releases at level 0"))
    (11L to 15L).foreach(i => assert(byId(i)._3 == 1L, s"row $i releases at level 1"))
    (21L to 23L).foreach { i =>
      assert(byId(i)._3 == 3L && byId(i)._1 == "*" && byId(i)._2 == "*",
        s"row $i must suppress with starred quasi values: ${byId(i)}")
    }
    (31L to 35L).foreach(i => assert(byId(i)._3 == 2L, s"row $i releases at level 2"))
    assert(byId(11L)._2 == "b1000:1", "level-1 band value is the coarsened one")
    // the audit the fixer exists to satisfy: released rows are k-anonymous
    val release = out.filter(col("level") < 3)
    val audit = Extensions33.kAnonymityReport(
      release, Seq("nation", "segment", "bal_band"), k = 5).head()
    assert(audit.getAs[Double]("risk_frac") == 0.0, s"release must carry zero risk: $audit")
    assert(audit.getAs[Long]("k_anonymity") >= 5L, s"k must be reached: $audit")
  }

  test("x108 fixture: rows partition the customer table; the published release audits k-anonymous at k=5") {
    val out = SparkEntry.queries("x108_k_anonymize")(spark, sf0001)
    val total = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(out.count() == total, "every customer row is accounted for")
    val release = out.filter(col("level") < 3)
    val audit = Extensions33.kAnonymityReport(
      release, Seq("nation", "segment", "bal_band"), k = 5).head()
    assert(audit.getAs[Double]("risk_frac") == 0.0,
      s"the fixer's own audit must read zero risk: $audit")
    assert(audit.getAs[Long]("k_anonymity") >= 5L)
    // determinism: the assignment is class-level, partitioning-independent
    val a = out.collect().map(_.toSeq).sortBy(_.head.toString)
    val b = SparkEntry.queries("x108_k_anonymize")(spark, sf0001)
      .repartition(7).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }
}
