package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions112

/** Batch-112 invariants: the FS EM recovers a planted two-class mixture
  * unlabeled (prior ≈ planted rate, posteriors split, uninformative
  * fields learned as m ≈ u), the posterior rejoin is lossless; KN
  * scoring penalizes context-bound continuations where the x44
  * raw-frequency backoff cannot.
  */
class Extensions112Spec extends SparkSpec {

  /** Pair fixture with a planted latent mixture: 40 "matches" agree on
    * both informative fields, 960 "non-matches" agree on neither; the
    * third field is a fair coin for BOTH classes (uninformative).
    */
  private def plantedPairs = {
    import spark.implicits._
    val rows =
      (0 until 40).map(i => (true, true, i % 2 == 0)) ++
      (0 until 960).map(i => (false, false, i % 2 == 0))
    rows.toDF("a_x", "a_y", "a_coin")
  }

  test("EM recovers the planted mixture: prior, posteriors, uninformative field") {
    val fit = Extensions112.fellegiSunterLinkage(
      plantedPairs, Seq("a_x", "a_y", "a_coin"), iters = 10)
    val rows = fit.collect().map(r =>
      r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap // pattern -> (n, g)
    assert(rows.size == 8, "all 2^3 patterns present, zero-count included")
    // (1,1,·) = patterns 6 and 7 are the planted match class
    assert(rows(6L)._2 > 990000L && rows(7L)._2 > 990000L,
      s"match-class posterior ~1: $rows")
    assert(rows(0L)._2 < 10000L && rows(1L)._2 < 10000L,
      s"non-match posterior ~0: $rows")
    val head = fit.filter(col("pattern") === 0L).collect()(0)
    val p = head.getAs[Long]("p_micro")
    assert(math.abs(p - 40000L) < 5000L, s"prior ~ planted 40/1000 rate: $p")
    // the coin field carries no signal: m3 ~ u3 ~ 0.5
    val (m3, u3) = (head.getAs[Long]("m3"), head.getAs[Long]("u3"))
    assert(math.abs(m3 - 500000L) < 30000L && math.abs(u3 - 500000L) < 30000L,
      s"uninformative field learns m~u~0.5: m3=$m3 u3=$u3")
  }

  test("linkagePosterior rejoins every pair with its pattern's posterior") {
    val model = Extensions112.fellegiSunterLinkage(
      plantedPairs, Seq("a_x", "a_y", "a_coin"), iters = 10)
    val scored = Extensions112.linkagePosterior(
      plantedPairs, Seq("a_x", "a_y", "a_coin"), model)
    assert(scored.count() == 1000L, "no pairs lost or duplicated")
    val byClass = scored.groupBy(col("a_x"))
      .agg(min(col("g_micro")).as("lo"), max(col("g_micro")).as("hi"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byClass(true)._1 > 990000L, s"all planted matches score ~1: $byClass")
    assert(byClass(false)._2 < 10000L, s"all non-matches score ~0: $byClass")
  }

  test("KN continuation probability: context-bound tokens score low in new contexts") {
    import spark.implicits._
    // "pine" appears often but ONLY after "san"; "tree" follows many words.
    // Both (q1) and (q2) use a bigram whose SECOND token is equally
    // frequent overall — KN separates them by continuation diversity.
    val c = Seq(
      (0L, "san pine san pine san pine san pine"),
      (1L, "a tree b tree c tree d tree"),
      (2L, "x pine"), // novel context -> pine (1 continuation context)
      (3L, "x tree")  // novel context -> tree (5 contexts)
    ).toDF("doc_id", "text")
    val got = Extensions112.knBigramScore(c, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(3L),
      s"one-context 'pine' must cost more than diverse 'tree': $got")
  }

  test("JaroWinkler: canonical values, boost gate, edge cases") {
    import graft.functions.JaroWinkler.similarity
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = similarity(u(a), u(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("aaa", "aaaa") - 0.9416666666666667) < 1e-12)
    assert(jw("ab", "ba") == 0.0, "window 0 -> no matches")
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0, "DuckDB empty semantics")
    assert(jw("abcdef", "abcdef") == 1.0)
    // below the 0.7 gate the prefix bonus must NOT apply
    assert(math.abs(jw("abqqqqqq", "abzzzzzz") - 0.5) < 1e-12)
  }

  test("jaro_winkler registered in SQL, runs inside codegen") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").collect()(0).getDouble(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
    // and through the Column form over a real plan (exercises doGenCode)
    import spark.implicits._
    import graft.functions.JaroWinkler.jaroWinkler
    val df = Seq(("dwayne", "duane"), ("a", "b")).toDF("x", "y")
      .select(jaroWinkler(col("x"), col("y")).as("jw"))
    val vs = df.collect().map(_.getDouble(0))
    assert(math.abs(vs(0) - 0.8400000000000001) < 1e-12 && vs(1) == 0.0)
  }

  test("x255/x256 fixtures: sane shapes") {
    val em = SparkEntry.queries("x255_linkage_em")(spark, sf0001).collect()
    assert(em.length == 8, "8 pattern rows")
    assert(em.map(_.getLong(0)).toSeq == (0L to 7L), "dense pattern ids")
    val full = em.find(_.getLong(0) == 7L).get
    assert(full.getAs[Long]("g_micro") > 990000L, "full agreement -> match")
    val kn = SparkEntry.queries("x256_kneser_ney")(spark, sf0001).collect()
    assert(kn.length > 400 && kn.forall(_.getDouble(2) > 0.0))
  }
}
