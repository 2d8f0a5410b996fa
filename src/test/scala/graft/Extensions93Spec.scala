package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions93

/** Batch-93 invariants: Neyman quotas follow n·s and the draw is a
  * pure function of the corpus; the cross-lingual audit sees exactly
  * the planted translated boilerplate; zero mixture drift reads KL 0.
  */
class Extensions93Spec extends SparkSpec {

  test("x212 planted: zero-variance stratum excluded; quotas ~ n*s; draw deterministic and within quota") {
    import spark.implicits._
    // stratum A: 40 rows, constant value (s=0 -> no quota);
    // B: 40 rows spread ~100; C: 20 rows spread ~1000 (s ~ 10x B's, n
    // half -> quota ~ 5x B's)
    val rows =
      (1 to 40).map(i => (i.toLong, "A", 500L)) ++
      (1 to 40).map(i => (100L + i, "B", (i % 2) * 200L)) ++
      (1 to 20).map(i => (200L + i, "C", (i % 2) * 2000L))
    val df = rows.toDF("id", "h", "v")
    val out = Extensions93.stratifiedSample(df, "id", "h", "v", budget = 30L)
    val got = out.collect()
    assert(!got.exists(_.getString(1) == "A"), "constant stratum draws nothing")
    val quotas = got.map(r => r.getString(1) -> r.getAs[Long]("quota")).toMap
    // w_B = 40*101 = 4040, w_C = 20*1005 = 20100; quota_B = 30*4040/24140 ~ 5
    assert(quotas("C") > quotas("B") * 3,
      s"high-variance stratum must dominate: $quotas")
    // per-stratum counts: the quota where fillable, the whole stratum
    // where the quota exceeds it (C's 25-row quota over 20 rows)
    val counts = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(counts("B").toLong == quotas("B"))
    assert(counts("C").toLong == math.min(quotas("C"), 20L))
    // deterministic: a second run draws the identical id set
    val again = Extensions93.stratifiedSample(df, "id", "h", "v", budget = 30L)
      .collect().map(_.getLong(0)).toSet
    assert(again == got.map(_.getLong(0)).toSet)
  }

  test("x213 planted: translated boilerplate surfaces as a cross-lang pair; same-lang dup suppressed") {
    import spark.implicits._
    val stem = "shared navigation header text appearing on every page of the site regardless of language tag"
    val corpus = Seq(
      (1L, s"$stem one", "en"),
      (2L, s"$stem two", "fr"),   // cross-lang near-dup of 1 -> reported
      (3L, s"$stem six", "en"),   // same-lang near-dup of 1 -> filtered
      (4L, "completely different content with none of those words at all here", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Extensions93.crossLingualDupPairs(corpus, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSet == Set((1L, 2L, "en", "fr"), (2L, 3L, "fr", "en")),
      s"exactly the cross-lang pairs: ${out.toSeq}")
  }

  test("x214 planted: identical releases read KL 0 on every source; a dropped source shows negative-share drift") {
    import spark.implicits._
    val d = (1 to 60).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val same = Extensions93.sourceMixKl(d, d, "source").collect()
    assert(same.forall(_.getAs[Long]("kl_contrib_micro") == 0L))
    assert(same.forall(_.getAs[Long]("kl_total_micro") == 0L))
    val dropped = Extensions93.sourceMixKl(d, d.filter(col("source") =!= "s0"), "source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(dropped("s0").getAs[Long]("n_next") == 0L)
    assert(dropped("s0").getAs[Long]("kl_total_micro") > 0L,
      "a real mixture shift must read positive total KL")
  }
}
