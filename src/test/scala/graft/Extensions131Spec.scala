package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions131

/** Batch-131 invariants: exactly one keeper per cluster under the
  * policy order; quantile normalization is the identity on a single
  * source and preserves per-source rank order; entropy extremes land
  * where theory puts them.
  */
class Extensions131Spec extends SparkSpec {

  test("dedupRepresentatives: priority wins over size wins over id; one keeper per cluster") {
    import spark.implicits._
    val body = "shared duplicate cluster body with plenty of common tokens here"
    val docs = Seq(
      // cluster: doc 1 (rank 3, sz 10), doc 2 (rank 1, sz 5), doc 3 (rank 1, sz 9)
      (1L, body, 3L, 10L), (2L, body, 1L, 5L), (3L, body, 1L, 9L),
      // singleton — must not be emitted
      (9L, "entirely different text with zero overlap whatsoever at all", 0L, 99L)
    ).toDF("doc_id", "text", "prio", "sz")
    val got = Extensions131.dedupRepresentatives(
        docs, "doc_id", "text", col("prio"), col("sz"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"singletons are not duplicates: $got")
    // rank 1 beats rank 3; within rank 1, sz 9 beats sz 5 -> doc 3 kept
    assert(got(3L) && !got(1L) && !got(2L), s"$got")
  }

  test("quantileMatch: single source is the identity; ranks are preserved per source") {
    import spark.implicits._
    val one = (1L to 9L).map(i => (i, "only", i * 10)).toDF("id", "src", "score")
    val idGot = Extensions131.quantileMatch(one, "id", "src", "score")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(idGot.forall(p => p._1 == p._2), s"one source -> identity: ${idGot.toSeq}")
    val two = ((1L to 5L).map(i => (i, "a", i * 100)) ++
      (11L to 15L).map(i => (i, "b", i))).toDF("id", "src", "score")
    val got = Extensions131.quantileMatch(two, "id", "src", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // within each source, norm order follows score order
    Seq("a", "b").foreach { s =>
      val rows = got.filter(_._2 == s).sortBy(_._3)
      assert(rows.map(_._4).sorted.sameElements(rows.map(_._4)),
        s"norm preserves per-source order: ${rows.toSeq}")
    }
    // both sources' extremes map to the global extremes
    assert(got.filter(_._2 == "a").map(_._4).max == got.map(_._3).max)
    assert(got.filter(_._2 == "b").map(_._4).min == got.map(_._3).min)
  }

  test("charEntropy: a one-symbol doc reads 0; a uniform alphabet reads ln(k) micro") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),              // H = 0
      (2L, "abcdabcdabcdabcd"),      // uniform over 4 symbols -> ln 4
      (3L, "ab")                     // uniform over 2 -> ln 2
    ).toDF("doc_id", "text")
    val got = Extensions131.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((8L, 0L)))
    assert(got(2L)._1 == 16L &&
      math.abs(got(2L)._2 - math.round(1e6 * math.log(4.0))) <= 1, s"${got(2L)}")
    assert(math.abs(got(3L)._2 - math.round(1e6 * math.log(2.0))) <= 1)
  }
}
