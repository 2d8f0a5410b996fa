package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: spin up executor threads, codegen, and the parquet
    // reader path once so JVM/JIT startup is not attributed to whichever
    // query happens to run first. Timed numbers below are unaffected
    // otherwise (each query is still a cold plan).
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("count(*)", "sum(l_quantity)").collect()
    } catch { case _: Throwable => () }
    // Reset shared-JVM state between queries so each timed number measures
    // the query, not the decay of everything that ran before it. Round-2
    // data: x02 measured 26.5s in-suite vs 7.0s isolated (same JVM, same
    // data) — the gap was accumulated checkpoint blocks, broadcast
    // remnants, and GC pressure, not the query. Unpersisting alone was not
    // enough; an explicit GC lets the ContextCleaner actually reap dropped
    // broadcasts/blocks before the next query starts.
    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    // optional args: query names (dev iteration filter; driver passes none)
    val only = if (args.nonEmpty) Some(args.toSet) else None
    // Per query: REPEATS timed runs (reset between each), report the MIN.
    // Round-3 data: the driver's recording showed 21.0s for a query that
    // costs 2.8s in any clean run — one co-tenant load spike on a single
    // recording faked a 5× regression. The min over independent runs is
    // robust to one-sided noise (a run can only be slowed, never sped up
    // past the query's true cost). The max/min spread per query is emitted
    // alongside so a noisy recording environment is visible in the artifact
    // itself rather than indistinguishable from a real regression.
    // Forcing is a noop-format write, not count(): count() lets Spark prune
    // every unreferenced projection, so map-only queries (normalize digests,
    // ratio columns) were costed at ~scan price. The noop sink evaluates
    // every output column and discards the rows — honest map-stage numbers,
    // zero I/O attributed.
    // Failures must be LOUD in the artifact: a query that throws fails at
    // plan time in milliseconds, so silently swallowing it would record a
    // tiny number that reads as a speedup. Failed queries are listed in an
    // "errors" array and excluded from the total.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val results = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val times = (1 to math.max(1, repeats)).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          reset() // outside the timed region
          dt
        }
        name -> times
      }
      .filter { case (name, _) => !failed.contains(name) }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    // Median (upper median for even n) alongside min: min is robust to
    // one-sided noise but can't distinguish "this recording was noisy"
    // from "this query regressed" when ALL repeats are inflated (round-5
    // driver artifact: slowest entries 2-3x their clean cost even at
    // min-of-3). min ≈ median → the number is trustworthy; min << median
    // → the environment was loaded and only min is usable.
    def med(v: Seq[Double]): Double = { val s = v.sorted; s(s.size / 2) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v.min) }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, v) => s"\"" + k + "\":" + fmt(med(v)) }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v.max / math.max(1e-9, v.min)) }
      .mkString("{", ",", "}")
    val total = results.values.map(_.min).sum
    val totalMed = results.values.map(med).sum
    val errs = failed.map(n => s"\"$n\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_median":$qsMed,"spread_max_over_min":$spread,"runs_per_query":$repeats,"errors":$errs,"sf":"$sfDir"}""")
    // The driver keeps only the TAIL of stdout, and the full line above
    // grows with the query count — round 4's artifact lost the leading
    // "total" field to truncation. Emit a compact summary as the FINAL
    // line so any tail capture still contains the verdict-relevant
    // numbers (total min+median, count, errors, top-5 slowest with both).
    val slowest = results.toSeq.sortBy { case (_, v) => -v.min }.take(5)
      .map { case (k, v) => s"\"" + k + "\":{\"min\":" + fmt(v.min) + ",\"med\":" + fmt(med(v)) + "}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"value_median":${fmt(totalMed)},"unit":"sec","n_queries":${results.size},"errors":$errs,"slowest":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
