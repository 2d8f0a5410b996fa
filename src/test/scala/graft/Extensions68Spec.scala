package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions68

/** Batch-68 invariants: the language confusion matrix reads a perfect
  * diagonal on marker-pure text and localizes planted confusion; the
  * centroid silhouette separates planted clusters and goes negative on
  * a misassigned point.
  */
class Extensions68Spec extends SparkSpec {

  test("x168 planted: marker-pure docs hit the diagonal; a German doc labeled French shows up off it") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the and of is a plain words"),
      ("en", "the of is more words here"),
      ("de", "der die das und ist worte"),
      ("fr", "der die das und ist worte"))   // labeled fr, reads de
      .toDF("lang", "text")
    val out = Extensions68.langIdConfusion(docs, "text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("en", "en")).getLong(2) == 2)
    assert(out(("de", "de")).getLong(2) == 1)
    assert(out(("fr", "de")).getLong(2) == 1, "the planted confusion cell")
    assert(out(("en", "en")).getDouble(4) == 0.75, "3 of 4 correct overall")
    assert(out(("fr", "de")).getDouble(3) == 1.0, "row share within fr")
  }

  test("x169 planted: separated clusters score ~1; a misassigned point scores negative") {
    import spark.implicits._
    def vec(base: Float): Array[Float] = Array(base, base, 0.0f, 0.0f)
    val rows = Seq(
      (1L, vec(0.0f), 0), (2L, vec(0.1f), 0), (3L, vec(0.05f), 0),
      (4L, vec(10.0f), 1), (5L, vec(10.1f), 1), (6L, vec(10.05f), 1),
      (7L, vec(10.02f), 2), (8L, vec(0.02f), 2)) // label 2 straddles both
      .toDF("vec_id", "embedding", "label")
    val out = Extensions68.centroidSilhouette(rows, "vec_id", "embedding",
      "label").collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(0) > 0.9 && out(1) > 0.9,
      s"tight separated clusters: $out")
    // label 2's centroid sits mid-space; its members are each closer to
    // the real clusters -> negative mean silhouette
    assert(out(2) < 0.0, s"straddling label reads negative: $out")
  }

  test("x168/x169 fixtures: accuracy consistent across rows; silhouettes bounded") {
    val conf = SparkEntry.queries("x168_langid_eval")(spark, sf0001).collect()
    assert(conf.nonEmpty)
    val accs = conf.map(_.getDouble(4)).distinct
    assert(accs.length == 1, "overall accuracy repeats on every cell")
    val sil = SparkEntry.queries("x169_silhouette")(spark, sf0001).collect()
    assert(sil.length == 10)
    sil.foreach { r =>
      val v = r.getDouble(2)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"silhouette in [-1,1]: $r")
    }
  }
}
