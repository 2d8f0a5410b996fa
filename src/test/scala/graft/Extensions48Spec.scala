package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions48

/** Batch-48 invariants: the projection actually kills the trained
  * direction, a planted common component stops drowning the signal,
  * and the fixture eval card is well-formed.
  */
class Extensions48Spec extends SparkSpec {

  test("x128 planted: removing a dominant common direction exposes the signal neighbor") {
    import spark.implicits._
    // every vector shares a huge e1 component; vectors 0 and 7 secretly
    // agree on e2, 1 and 5 on e3 — invisible under raw cosine (all ~1)
    def v(sig: Int, s: Float): Seq[Float] =
      Seq.tabulate(4)(j => if (j == 0) 10.0f else if (j == sig) s else 0.0f)
    val rows = Seq(
      (0L, v(1, 1.0f)), (1L, v(2, 1.0f)), (2L, v(3, 0.2f)), (3L, v(3, -0.2f)),
      (4L, v(1, -1.0f)), (5L, v(2, 0.9f)), (6L, v(3, 0.1f)), (7L, v(1, 0.9f)))
      .toDF("vec_id", "vec")
    val pq = Extensions48.allButTop(rows, "vec_id", "vec", dim = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    // the shared direction is gone: residual e1 mass is tiny
    pq.values.foreach { p =>
      assert(math.abs(p(0)) < 50000L, s"e1 removed: ${p.toSeq}")
    }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum)
        * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val best0 = pq.keys.filter(_ != 0L).maxBy(k => cos(pq(0L), pq(k)))
    assert(best0 == 7L, s"after correction, 0's neighbor is its signal twin: $best0")
    val best1 = pq.keys.filter(_ != 1L).maxBy(k => cos(pq(1L), pq(k)))
    assert(best1 == 5L, s"after correction, 1's neighbor is its signal twin: $best1")
  }

  test("x128 projection is orthogonal to the trained direction (up to micro rounding)") {
    val v = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pq = Extensions48.allButTop(v, "vec_id", "embedding")
    // re-derive the direction and check residual alignment ~ 0
    val m = SparkEntry.queries("x127_pca_power")(spark, sf0001)
      .collect().map(_.getLong(1))
    val mLit = array(m.map(lit(_)): _*)
    val resid = pq.select(
        abs(aggregate(zip_with(col("pq"), mLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)).as("r"))
      .agg(max(col("r"))).collect().head.getLong(0)
    // original alignments are ~1e11-1e13; rounding residue is < 64 * 5e5
    assert(resid < 100000000L, s"projected vectors align ~0 with the direction: $resid")
  }

  test("x128 fixture: card shape — contiguous ranks, per-query constant overlap in [0,1]") {
    val out = SparkEntry.queries("x128_all_but_top")(spark, sf0001).collect()
    assert(out.length == 25)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L).toSeq)
      val ov = rows.map(_.getDouble(6)).distinct
      assert(ov.length == 1 && ov.head >= 0.0 && ov.head <= 1.0, s"q=$q: ${ov.toSeq}")
      rows.foreach { r =>
        assert(r.getLong(2) != q && r.getLong(4) != q, "never self")
      }
    }
  }
}
