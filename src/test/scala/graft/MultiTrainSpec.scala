package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions20, Extensions26}

/** Parity contract for the round-14 fused multi-model GD kernel: M
  * models trained in one aggregation per iteration must be weight-for-
  * weight identical to the original one-model-at-a-time loop. The
  * reference below IS that original loop (count, per-iteration F+1
  * DECIMAL(38,0) gradient sums over the filtered table, BigInt half-
  * away update), re-implemented inline so a kernel-wide regression
  * cannot hide behind trainLogregTrace's own delegation to the kernel.
  */
class MultiTrainSpec extends SparkSpec {
  import spark.implicits._

  private val F = Extensions26.NumBuckets

  private def halfAwayDivBig(num: BigInt, den: BigInt): Long = {
    val s = if (num < 0) BigInt(-1) else BigInt(1)
    (s * ((num.abs * 2 + den) / (den * 2))).toLong
  }

  /** The pre-r14 single-model training loop, verbatim semantics. */
  private def referenceTrain(
      feat: org.apache.spark.sql.DataFrame, iters: Int,
      lrDen: Long = 20L): Seq[Array[Long]] = {
    val n = feat.count()
    require(n > 0)
    var w = Array.fill(F + 1)(0L)
    val trace = Seq.newBuilder[Array[Long]]
    for (_ <- 1 to iters) {
      val margin = graft.functions.VectorFunctions.long_dot(
        array(w.map(lit(_)): _*), col("x"))
      val withR = feat.select(col("x"),
        (round(lit(1e6) / (lit(1.0) + exp(-margin / lit(1e6))), 0)
          .cast("long") - col("y") * 1000000L).as("r"))
      val sums = (0 to F).map(j =>
        sum((element_at(col("x"), j + 1) * col("r")).cast("decimal(38,0)"))
          .as(s"g$j"))
      val gradRow = withR.agg(sums.head, sums.tail: _*).collect()(0)
      w = Array.tabulate(F + 1)(j =>
        w(j) - halfAwayDivBig(BigInt(gradRow.getDecimal(j).toBigInteger),
          BigInt(lrDen) * n))
      trace += w
    }
    trace.result()
  }

  private def fixtureFeat() = {
    val docs = (1L to 40L).map { i =>
      val tks = (0 until (5 + (i % 7)).toInt)
        .map(j => s"tok${(i * 31 + j * 17) % 23}")
      (i, tks.mkString(" "), (i % 3 == 0))
    }.toDF("doc_id", "text", "keep")
    Extensions26.hashedFeatures(docs, "doc_id", "text", "keep")
      .localCheckpoint(eager = true)
  }

  test("fused K-model training is weight-identical to K separate loops") {
    val feat = fixtureFeat()
    val k = 3
    val foldOf = pmod(col("doc_id"), lit(k.toLong))
    val trained = Extensions26.trainLogregMultiTrace(feat,
      (0 until k).map(f =>
        Extensions26.LogregSpec(Some(foldOf =!= f.toLong), col("y"))),
      iters = 4)
    (0 until k).foreach { f =>
      val ref = referenceTrain(
        feat.filter(pmod(col("doc_id"), lit(k.toLong)) =!= f.toLong), iters = 4)
      assert(trained.traces(f).map(_.toSeq) == ref.map(_.toSeq),
        s"fold $f weight trace diverged from the unfused reference")
      assert(trained.ns(f) ==
        feat.filter(pmod(col("doc_id"), lit(k.toLong)) =!= f.toLong).count())
    }
  }

  test("per-model label columns: fused (all-rows, gated) pair matches references") {
    val feat = fixtureFeat().withColumn("y2",
      (pmod(col("doc_id"), lit(2L)) === 0L).cast("long"))
    val trained = Extensions26.trainLogregMultiTrace(feat, Seq(
      Extensions26.LogregSpec(None, col("y")),
      Extensions26.LogregSpec(Some(col("doc_id") > 10L), col("y2"))),
      iters = 3)
    val refA = referenceTrain(feat, iters = 3)
    val refB = referenceTrain(
      feat.filter(col("doc_id") > 10L).select(col("y2").as("y"), col("x")),
      iters = 3)
    assert(trained.traces(0).map(_.toSeq) == refA.map(_.toSeq))
    assert(trained.traces(1).map(_.toSeq) == refB.map(_.toSeq))
  }

  test("chunked past MaxFusedModels: every batch trains identically") {
    val feat = fixtureFeat()
    val m = 17 // > MaxFusedModels=16 forces the two-batch path
    val trained = Extensions26.trainLogregMultiTrace(feat,
      Seq.fill(m)(Extensions26.LogregSpec(None, col("y"))), iters = 2)
    val ref = referenceTrain(feat, iters = 2)
    assert(trained.traces.size == m && trained.ns.size == m)
    trained.traces.foreach(t => assert(t.map(_.toSeq) == ref.map(_.toSeq)))
  }

  test("brierSumsMulti matches per-model direct aggregation") {
    val feat = fixtureFeat()
    val w1 = Array.tabulate(F + 1)(j => (j * 1000L) - 16000L)
    val w2 = Array.fill(F + 1)(0L)
    val got = Extensions26.brierSumsMulti(feat, Seq(
      (Some(pmod(col("doc_id"), lit(2L)) === 0L), w1),
      (None, w2)))
    def direct(df: org.apache.spark.sql.DataFrame, w: Array[Long]): (Long, BigInt) = {
      val margin = graft.functions.VectorFunctions.long_dot(
        array(w.map(lit(_)): _*), col("x"))
      val d = round(lit(1e6) / (lit(1.0) + exp(-margin / lit(1e6))), 0)
        .cast("long") - col("y") * 1000000L
      val r = df.agg(count(lit(1)), sum((d * d).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), BigInt(r.getDecimal(1).toBigInteger))
    }
    assert(got(0) == direct(feat.filter(pmod(col("doc_id"), lit(2L)) === 0L), w1))
    assert(got(1) == direct(feat, w2))
  }

  test("x276/x265-shaped end-to-end stays on the real fixture labels") {
    // gopher labels over a tiny synthetic corpus: the fused path must
    // survive a fold with all-one-label rows (gradient still exact)
    val docs = (1L to 30L).map { i =>
      val n = 60 + (i % 5).toInt
      (i, (0 until n).map(j => s"w${(i + j) % 11}").mkString(" "))
    }.toDF("doc_id", "text")
    val labeled = Extensions20.gopherRuleCard(docs, "doc_id", "text",
      carryCols = Seq("text"))
      .select(col("doc_id"), col("text"), col("keep"))
    val feat = Extensions26.hashedFeatures(labeled, "doc_id", "text", "keep")
      .localCheckpoint(eager = true)
    val foldOf = pmod(col("doc_id"), lit(2L))
    val trained = Extensions26.trainLogregMultiTrace(feat,
      (0 until 2).map(f =>
        Extensions26.LogregSpec(Some(foldOf =!= f.toLong), col("y"))),
      iters = 2)
    (0 until 2).foreach { f =>
      val ref = referenceTrain(feat.filter(foldOf =!= f.toLong), iters = 2)
      assert(trained.traces(f).map(_.toSeq) == ref.map(_.toSeq))
    }
  }
}
