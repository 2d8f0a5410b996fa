package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions105

/** Batch-105 invariants: the Bloom prefilter changes the PLAN, never the
  * ANSWER; the Morton code interleaves exactly; the z-order layout
  * localizes a second-dimension predicate to a fraction of the files a
  * first-dimension sort would touch; the chunker covers every token
  * with full-size windows.
  */
class Extensions105Spec extends SparkSpec {

  test("bloomSemiJoin: identical to the exact semi join, probe sits under the join") {
    val li = graft.model.Tables.load(spark, sf0001, "lineitem")
    val hi = graft.model.Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 200000.0)
    val got = Extensions105.bloomSemiJoin(li, "l_orderkey", hi, "o_orderkey", 1 << 12)
    val exact = li.join(hi.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(got.count() == exact.count() && exact.count() > 0)
    assert(got.select(sum(col("l_extendedprice"))).head.getDouble(0) ==
      exact.select(sum(col("l_extendedprice"))).head.getDouble(0))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe must be in the plan:\n$plan")
  }

  test("bloomSemiJoin: an undersized filter (high fpp) still returns the exact answer") {
    val li = graft.model.Tables.load(spark, sf0001, "lineitem")
    val hi = graft.model.Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 200000.0)
    val tiny = Extensions105.bloomSemiJoin(li, "l_orderkey", hi, "o_orderkey",
      expectedItems = 2)
    val exact = li.join(hi.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(tiny.count() == exact.count())
  }

  test("morton32: known interleavings") {
    import spark.implicits._
    val got = Seq((3L, 1L), (65535L, 0L), (0L, 65535L), (0L, 0L))
      .toDF("x", "y")
      .select(Extensions105.morton32(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x bits -> even positions, y bits -> odd: (3,1) = 1@0 + 1@2 + 1@1 = 7
    assert(got == Seq(7L, 0x55555555L, 0xAAAAAAAAL, 0L))
  }

  test("z-order layout: a suppkey-only predicate touches a fraction of the files a partkey sort needs") {
    val li = graft.model.Tables.load(spark, sf0001, "lineitem")
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    Extensions105.zOrderWrite(li, "l_partkey", "l_suppkey", zdir, targetFiles = 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(ldir)
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir).filter(col("l_suppkey") === 3)
        .select(input_file_name()).distinct().count()
    val (zf, lf) = (filesTouched(zdir), filesTouched(ldir))
    // linear-by-partkey scatters suppkey 3 across ~all 16 files; the
    // 4-bit z prefix confines it to the suppkey band (~4 of 16)
    assert(lf >= 12, s"partkey sort should scatter suppkey: touched $lf of 16")
    assert(zf * 2 <= lf, s"z-order must localize: $zf vs $lf files")
    // identical content either way
    assert(spark.read.parquet(zdir).count() == li.count())
  }

  test("chunkDocuments: full-size windows, clamped tail, short docs yield one chunk") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),      // len 5: starts [1, 2] after clamping
      (2L, "a b"),            // short: one 2-token chunk
      (3L, "a b c d e f g h") // len 8: starts 1, 3, 5 (5 = 8-4+1 exactly)
    ).toDF("doc_id", "text")
    val got = Extensions105.chunkDocuments(df, "doc_id", "text", size = 4, overlap = 2)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._3, c._5)).toSeq ==
      Seq((1L, "a b c d"), (2L, "b c d e")), s"clamped tail: ${d1.toSeq}")
    val d2 = got.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, 1L, 2L, "a b")))
    val d3 = got.filter(_._1 == 3L)
    assert(d3.map(_._3).toSeq == Seq(1L, 3L, 5L))
    assert(d3.forall(_._4 == 4L), "every chunk of a long doc is full-size")
    // coverage: last token of every doc appears in its last chunk
    assert(d3.last._5.endsWith("h") && d1.last._5.endsWith("e"))
  }

  test("x238/x239/x240 fixtures: sane shapes") {
    val bj = SparkEntry.queries("x238_bloom_semi_join")(spark, sf0001).collect()
    assert(bj.length == 3 && bj.map(_.getLong(1)).sum > 0)
    val zc = SparkEntry.queries("x239_zorder_card")(spark, sf0001).collect()
    assert(zc.nonEmpty && zc.length <= 16)
    // the z-order promise: every bucket's partkey span is a strict
    // subset of the global range (a partkey sort would give this), AND
    // every bucket's suppkey span is too (a partkey sort would NOT)
    val (pkMin, pkMax) = (zc.map(_.getLong(2)).min, zc.map(_.getLong(3)).max)
    assert(zc.forall(r => (r.getLong(3) - r.getLong(2)) < (pkMax - pkMin)),
      "each z-bucket covers a strict partkey sub-range")
    val ck = SparkEntry.queries("x240_chunks")(spark, sf0001)
    assert(ck.filter(col("n_toks") =!= 64 && col("chunk_idx") > 0).count() == 0,
      "only a doc's first chunk may run short")
  }
}
