package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions108

/** Batch-108 invariants: the sign projection is deterministic, nested,
  * and preserves cosine within JL distortion; the sorted neighborhood
  * finds exactly the prefix-blocked near-dups and misses the rest.
  */
class Extensions108Spec extends SparkSpec {

  test("randomProjection: deterministic, nested prefixes, cosine roughly preserved at k=32") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Extensions108.randomProjection(e, "embedding", 64, 32)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Extensions108.randomProjection(e, "embedding", 64, 8)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a(0L).take(8) == b(0L), "k=8 is the prefix of k=32 (nested signs)")
    assert(a(1L).length == 32)
    // JL sanity on one planted pair: identical vectors project identically
    val twin = Seq((1L, Array(1f, 2f, 3f, 4f)), (2L, Array(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val tp = Extensions108.randomProjection(twin, "embedding", 4, 4)
      .select(col("proj")).collect().map(_.getSeq[Long](0))
    assert(tp(0) == tp(1))
  }

  test("projection sweep: error shrinks as k grows (8 -> 32) on the fixture") {
    val got = SparkEntry.queries("x247_projection_sweep")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet == Set(8L, 16L, 32L))
    assert(got(32L) <= got(8L),
      s"more projection dims must not read MORE distortion: $got")
  }

  test("sortedNeighborhoodPairs: prefix-adjacent dups found, prefix-distant dups missed") {
    import spark.implicits._
    // two docs sharing a long prefix AND high Jaccard -> adjacent ranks,
    // found; two docs with the same high Jaccard but a scrambled first
    // token -> distant ranks (w=3 with 30 spacer docs between), missed
    val body = (0 until 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"aaaa shared $body"),
      (2L, s"aaaa shared $body extra"),
      (3L, s"zzzz shared $body"),
      (4L, s"mmmm shared $body extra2")
    ) ++ (100L until 130L).map(i => (i, s"spacer${i} " +
      (0 until 20).map(j => s"u${i}x$j").mkString(" ")))
    val got = Extensions108.sortedNeighborhoodPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", w = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"prefix-adjacent near-dup must be found: $got")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      s"prefix-distant dups are out of the window by design: $got")
  }

  test("x247/x248 fixtures: sane shapes") {
    val sw = SparkEntry.queries("x247_projection_sweep")(spark, sf0001).collect()
    assert(sw.length == 3 && sw.forall(_.getLong(1) == 200L), "10 x 20 pairs per k")
    val sn = SparkEntry.queries("x248_sorted_neighborhood")(spark, sf0001).collect()
    assert(sn.forall(_.getDouble(2) >= 0.5))
  }
}
