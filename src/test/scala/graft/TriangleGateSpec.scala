package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions29

/** Contract for the r14 size-gated triangle counter: the under-gate
  * driver path (dense remap + oriented sorted-adjacency intersection)
  * must agree node-for-node with the distributed wedge join it
  * replaces below the gate, and with hand-computed references.
  */
class TriangleGateSpec extends SparkSpec {
  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("4-clique: every node sits in 3 triangles; path-4 has none") {
    val clique = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toDF("a", "b")
    assert(counts(Extensions29.triangleCounts(clique, "a", "b")) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(counts(Extensions29.triangleCounts(path, "a", "b")) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("driver path ≡ distributed wedge join on a dense pseudo-random graph") {
    // deterministic ~n*k edge soup with dupes, self-loops and both
    // orderings — the dedup/orientation prelude must normalize all of it
    val raw = ((0 until 900).map { i =>
      val a = (i * 7919L) % 60L
      val b = (i * 104729L + 13L) % 60L
      (a, b)
    } ++ (for { a <- 0L to 11L; b <- 0L to 11L if a != b } yield (a, b)))
      .toDF("a", "b")
    val gated = counts(Extensions29.triangleCounts(raw, "a", "b"))
    val distributed = counts(
      Extensions29.triangleCounts(raw, "a", "b", driverMaxEdges = 0L))
    assert(gated == distributed,
      "driver triangle counts diverged from the wedge-join path")
    assert(gated.values.sum > 0L, "degenerate fixture: no triangles found")
  }

  test("duplicate-heavy input: counts are simple-graph counts, not multi-edge") {
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L))
      .toDF("a", "b")
    assert(counts(Extensions29.triangleCounts(dup, "a", "b")) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
