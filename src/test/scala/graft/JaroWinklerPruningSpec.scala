package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler.jaroWinkler
import graft.plans.JaroWinklerLengthPruning

/** The length-ratio pruning rule: provably lossless (bit-identical
  * results), visible in the optimized plan ahead of the comparator,
  * idempotent under the fixed-point batch, vacuous below t = 0.8.
  */
class JaroWinklerPruningSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // names engineered around the guard: equal-length near-dups (must
    // survive), a short-vs-long pair (guard prunes it BEFORE the
    // comparator would return ~0.55), boundary-ratio pairs
    Seq((1L, "jonathan smith"), (2L, "jonathan smyth"), (3L, "jo"),
      (4L, "jonathan smith-berger"), (5L, "jon")).toDF("id", "s")
  }

  private def pairs(t: Double) = {
    val d = corpus
    d.as("a").join(d.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        jaroWinkler(col("a.s"), col("b.s")).as("jw"))
      .filter(col("jw") >= t)
  }

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ JaroWinklerLengthPruning
    try f finally spark.experimental.extraOptimizations = before
  }

  test("rule output is bit-identical to the unpruned filter") {
    val bare = pairs(0.9).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = withRule {
      pairs(0.9).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(pruned == bare, s"lossless guard: $pruned vs $bare")
    assert(bare.exists(p => p._1 == 1L && p._2 == 2L), "near-dup survives")
  }

  test("guard lands in the optimized plan, once, ahead of the comparator") {
    withRule {
      val df = pairs(0.9)
      df.collect()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("least(length"),
        s"guard visible in the optimized plan:\n$optimized")
      val count = "least\\(length".r.findAllIn(optimized).length
      assert(count == 1, s"fixed-point batch must stay idempotent ($count):\n$optimized")
      // cheap conjunct first: short-circuit order in the predicate
      // (which lives on the Join after PushDownPredicates)
      val predLine = optimized.linesIterator
        .find(l => l.contains("least(length") && l.contains("jaro_winkler")).get
      assert(predLine.indexOf("least(length") < predLine.indexOf("jaro_winkler"),
        s"guard must precede the comparator:\n$predLine")
    }
  }

  test("vacuous below t = 0.8: plan untouched") {
    withRule {
      val df = pairs(0.75)
      df.collect()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("least(length"),
        s"theta <= 0 must not add a guard:\n$optimized")
    }
  }

  test("x257 through jaroWinklerPairs picks the rule up lazily") {
    val df = SparkEntry.queries("x257_jaro_winkler")(spark, sf0001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least(length"),
      s"use-site injection must activate the guard:\n$optimized")
  }
}
