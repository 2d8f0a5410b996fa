package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions16, Extensions17, Extensions26, Extensions27, ModelStore}

/** Model artifacts must survive the JVM: write → load in a FRESH
  * SparkSession → the served outputs are byte-identical to the
  * in-process model; a load against a mismatched training config fails
  * loudly instead of serving the wrong model.
  */
class ModelStoreSpec extends SparkSpec {

  private lazy val labeled = {
    import spark.implicits._
    (1L to 80L).map { i =>
      val good = i % 3 == 0
      val text = if (good) s"the quick brown fox $i jumps high again and again"
      else s"zz$i zz$i zz$i"
      (i, text, good)
    }.toDF("doc_id", "text", "keep")
  }

  test("logreg weights: write → fresh-session load → scoring is byte-identical; config mismatch throws") {
    val w = Extensions26.trainFromText(labeled, "doc_id", "text", "keep", iters = 4)
    val path = tmpDir("graft-modelstore-lr") + "/logreg"
    ModelStore.writeLogreg(spark, path, w, iters = 4)
    val fresh = spark.newSession()
    val loaded = ModelStore.loadLogreg(fresh, path, iters = 4)
    assert(loaded.toSeq == w.toSeq, "loaded weight vector must be identical")
    val a = Extensions26.scoreWithWeights(labeled, "doc_id", "text", "keep", w)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Extensions26.scoreWithWeights(labeled, "doc_id", "text", "keep", loaded)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq, "served margins must be byte-identical")
    val e = intercept[IllegalArgumentException] {
      ModelStore.loadLogreg(fresh, path, iters = 8)
    }
    assert(e.getMessage.contains("iters"), s"mismatch must name the field: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      ModelStore.loadLogreg(fresh, path, numBuckets = 16, iters = 4)
    }
  }

  test("BPE merges: write → fresh-session load → encoding is byte-identical; merge-count mismatch throws") {
    val merges = Extensions16.trainBpe(labeled, "text", numMerges = 6)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val path = tmpDir("graft-modelstore-bpe") + "/bpe"
    ModelStore.writeBpeMerges(spark, path, merges)
    val fresh = spark.newSession()
    val loaded = ModelStore.loadBpeMerges(fresh, path, numMerges = merges.length)
    assert(loaded == merges, "loaded merge table must be identical and ordered")
    val a = Extensions17.applyBpe(labeled, "doc_id", "text", merges.map(m => (m._2, m._3)))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Extensions17.applyBpe(labeled, "doc_id", "text", loaded.map(m => (m._2, m._3)))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq, "encoding under the loaded tokenizer must be byte-identical")
    intercept[IllegalArgumentException] {
      ModelStore.loadBpeMerges(fresh, path, numMerges = merges.length + 1)
    }
  }

  test("PQ codebook: write → fresh-session load → ADC serving is byte-identical; geometry mismatch throws") {
    import spark.implicits._
    // ≥ CodebookK vectors of the fixed 64-dim geometry
    val vecs = (0L until 40L)
      .map(i => (i, Array.tabulate(64)(j => ((i * 7 + j * 3) % 13).toFloat / 13f)))
      .toDF("vec_id", "embedding")
    val cb = Extensions27.pqTrain(vecs, "vec_id", "embedding", iters = 2)
    val path = tmpDir("graft-modelstore-pq") + "/codebook"
    ModelStore.writePqCodebook(spark, path, cb)
    val fresh = spark.newSession()
    val loaded = ModelStore.loadPqCodebook(fresh, path)
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = Extensions27.pqEncode(vecs, "vec_id", "embedding", cb)
    val q = vecs.filter(col("vec_id") < 3)
    val a = Extensions27.pqAdcTopK(codes, q, "vec_id", "embedding", cb)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = Extensions27.pqAdcTopK(
        Extensions27.pqEncode(vecs, "vec_id", "embedding", loaded),
        q, "vec_id", "embedding", loaded)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq == b.toSeq, "ADC top-k under the loaded codebook must be byte-identical")
    intercept[IllegalArgumentException] {
      ModelStore.loadPqCodebook(fresh, path, k = 8)
    }
  }
}
