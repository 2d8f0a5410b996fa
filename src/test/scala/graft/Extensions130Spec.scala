package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions130

/** Batch-130 invariants: DBSCAN roles obey their definitions on a
  * constructed geometry; MI ranks the pure token first; hubness counts
  * are conserved; Benford shares sum to ~1; truncation recall is k for
  * identical prefixes.
  */
class Extensions130Spec extends SparkSpec {

  private def vec(xs: Double*): Array[Float] =
    (xs.map(_.toFloat) ++ Array.fill(64 - xs.size)(0f)).toArray

  test("dbscan2d: a tight blob is core, a reachable satellite is border, a far point noise") {
    import spark.implicits._
    // blob of 5 points within eps of each other around (0,0); point 6 at
    // (0.028, 0) reaches only cores 2 and 4 (ball holds 3 points incl.
    // itself < minPts) -> border; point 7 is isolated -> noise
    val pts = Seq(
      (1L, vec(0.000, 0.000)), (2L, vec(0.004, 0.000)),
      (3L, vec(0.000, 0.004)), (4L, vec(0.004, 0.004)),
      (5L, vec(0.002, 0.002)),
      (6L, vec(0.028, 0.000)),
      (7L, vec(0.500, 0.500))
    ).toDF("vec_id", "embedding")
    val got = Extensions130.dbscan2d(pts, "vec_id", "embedding",
        epsMicro = 25000L, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    (1L to 5L).foreach(i => assert(got(i) == (("core", 1L)), s"$i -> ${got(i)}"))
    assert(got(6L)._1 == "border" && got(6L)._2 == 1L, s"6 -> ${got(6L)}")
    assert(got(7L) == (("noise", -1L)), s"7 -> ${got(7L)}")
  }

  test("dbscan2d: two separated blobs get distinct min-id cluster labels") {
    import spark.implicits._
    val pts = (
      (1L to 5L).map(i => (i, vec(0.001 * i, 0.0))) ++
      (11L to 15L).map(i => (i, vec(0.3 + 0.001 * (i - 10), 0.0)))
    ).toDF("vec_id", "embedding")
    val got = Extensions130.dbscan2d(pts, "vec_id", "embedding",
        epsMicro = 25000L, minPts = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert((11L to 15L).forall(got(_) == 11L))
  }

  test("tokenLabelMi: a label-pure token outranks a label-independent one") {
    import spark.implicits._
    val docs = (0 until 20).map { i =>
      val pure = if (i < 10) "puretok" else "othertok"
      (i.toLong, s"filler$i common $pure", if (i < 10) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val got = Extensions130.tokenLabelMi(docs, "doc_id", "text", "y",
        topK = 10, minDf = 5L)
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    val byTok = got.toMap
    assert(byTok("puretok") > byTok("common"),
      s"pure token must carry more MI: $got")
    assert(math.abs(byTok("common")) < 1e-9,
      s"a token present in every doc carries zero MI: $got")
    assert(got.head._1 == "othertok" || got.head._1 == "puretok",
      s"one of the pure tokens ranks first: $got")
  }

  test("knnHubness: in-degree sums to k*n and mutual edges are symmetric counts") {
    import spark.implicits._
    val emb = (0 until 12).map(i =>
      (i.toLong, vec(math.cos(i * 0.5), math.sin(i * 0.5)))).toDF("vec_id", "embedding")
    val got = Extensions130.knnHubness(emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 12)
    assert(got.map(_._2).sum == 36L, "every node emits k=3 edges, so in-degrees sum to 3n")
    assert(got.forall(r => r._3 >= 0L && r._3 <= 3L))
  }

  test("benfordCard: shares sum to ~1 per type and the constants match Benford") {
    val got = SparkEntry.queries("x291_benford")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val byType = got.groupBy(_._1)
    byType.foreach { case (t, rows) =>
      val s = rows.map(_._3).sum
      assert(math.abs(s - 1.0) < 0.001, s"$t shares sum to $s")
    }
    val d1 = got.find(_._2 == 1L).get
    assert(d1._4 == 0.301, s"Benford(1) must be 0.301: $d1")
  }

  test("matryoshkaRecall: prefix-only vectors give perfect overlap") {
    import spark.implicits._
    // all mass in the first 16 dims -> truncation changes nothing
    val emb = (0 until 15).map(i =>
      (i.toLong, vec(math.cos(i * 0.4), math.sin(i * 0.4), 0.3 * i))).toDF("vec_id", "embedding")
    val got = Extensions130.matryoshkaRecall(emb, "vec_id", "embedding",
        k = 5, prefixDims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(_._2 == 5L), s"identical rankings -> overlap k: ${got.toSeq}")
  }
}
