package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extensions6, Extensions11, Extensions12}
import scala.util.Random

/** Randomized-input properties for the round-4 curation operators —
  * seeded generators (reproducible), invariants checked against
  * driver-side reference computations.
  */
class CurationPropertySpec extends SparkSpec {

  private def randomCorpus(rnd: Random, n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val len = 1 + rnd.nextInt(30)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(40)}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("property: funnel counts equal driver-side predicate evaluation on random corpora") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val df = randomCorpus(rnd, 80).cache()
      val lens = df.select(col("doc_id"),
        size(split(col("text"), " ")).as("n")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val cut1 = 5 + rnd.nextInt(10)
      val cut2 = 10 + rnd.nextInt(15)
      val funnel = Extensions6.filterFunnel(df, Seq(
        "ge" -> (size(split(col("text"), " ")) >= cut1),
        "le" -> (size(split(col("text"), " ")) <= cut2)))
        .orderBy(col("stage_no")).collect()
      val expPass1 = lens.values.count(_ >= cut1).toLong
      val expPass2 = lens.values.count(_ <= cut2).toLong
      val expSurv2 = lens.values.count(n => n >= cut1 && n <= cut2).toLong
      assert(funnel(0).getAs[Long]("n_pass") == expPass1, s"seed $seed stage 1 pass")
      assert(funnel(0).getAs[Long]("n_survive") == expPass1, s"seed $seed stage 1 survive")
      assert(funnel(1).getAs[Long]("n_pass") == expPass2, s"seed $seed stage 2 pass")
      assert(funnel(1).getAs[Long]("n_survive") == expSurv2, s"seed $seed stage 2 survive")
      df.unpersist()
    }
  }

  test("property: stratifiedSplit partitions exhaustively at any permille mix") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = df.count()
    for ((v, t) <- Seq((0, 0), (1000, 0), (0, 1000), (333, 333), (10, 990))) {
      val s = Extensions11.stratifiedSplit(df, "doc_id", v, t)
      val counts = s.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum == n, s"($v,$t): split must be exhaustive")
      if (v == 0) assert(!counts.contains("val"), s"($v,$t): no val bucket expected")
      if (v + t == 1000) assert(!counts.contains("train"),
        s"($v,$t): permilles covering everything leave no train")
    }
  }

  test("property: trainingOrder is a global bijection doc -> (shard, ord) for odd shard counts") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
    for (nShards <- Seq(1, 3, 17)) {
      val o = Extensions6.trainingOrder(df, "doc_id", nShards)
      assert(o.count() == df.count())
      assert(o.select("shard", "ord").distinct().count() == df.count(),
        s"nShards=$nShards: (shard, ord) must be unique")
      val maxShard = o.agg(max("shard")).collect()(0).getLong(0)
      assert(maxShard < nShards, s"shard ids must stay under $nShards")
    }
  }

  test("property: rrfFuse equals a driver-side reference on random rankings") {
    import spark.implicits._
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      // 2-3 rankings over 4 queries x up to 8 candidates
      val lists = (0 until 2 + rnd.nextInt(2)).map { _ =>
        (0 until 4).flatMap { q =>
          rnd.shuffle((0 until 8).toList).take(5).zipWithIndex
            .map { case (c, i) => (q.toLong, c.toLong, (i + 1).toLong) }
        }
      }
      val dfs = lists.map(_.toDF("q_id", "c_id", "rk"))
      val got = Extensions12.rrfFuse(dfs, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(4)) -> r.getLong(1)).toMap
      // reference: sum 1/(60+rk) per (q,c), sort by (-score, c), take 3
      val ref = lists.flatten.groupBy(p => (p._1, p._2))
        .map { case ((q, c), rs) => (q, c, rs.map(p => 1.0 / (60 + p._3)).sum) }
        .groupBy(_._1).flatMap { case (q, cs) =>
          cs.toSeq.sortBy(t => (-math.rint(t._3 * 1e6) / 1e6, t._2)).take(3)
            .zipWithIndex.map { case ((_, c, _), i) => (q, i + 1L) -> c }
        }
      assert(got == ref, s"seed $seed: fused ranking diverged from reference")
    }
  }

  test("property: stripDuplicateSpans equals a driver-side reference on random corpora") {
    import graft.ops.Extensions16
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new Random(seed)
      // small vocabulary + short docs => real cross-doc gram collisions
      val df = (0 until 40).map { i =>
        val len = 3 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(8)}").mkString(" "))
      }.foldLeft(Seq.empty[(Long, String)])(_ :+ _) match {
        case rows => { import spark.implicits._; rows.toDF("doc_id", "text") }
      }
      val n = 3
      // reference: same coverage semantics, computed naively on the driver
      val texts = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val gramsOf = texts.view.mapValues { t =>
        val tk = t.toLowerCase.split(" ")
        if (tk.length < n) Seq.empty
        else (0 to tk.length - n).map(i => (i + 1, tk.slice(i, i + n).mkString(" ")))
      }.toMap
      val df2docs = gramsOf.toSeq.flatMap { case (id, gs) => gs.map(g => (g._2, id)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expected = texts.map { case (id, t) =>
        val tk = t.split(" ")
        val starts = gramsOf(id).filter(g => df2docs(g._2) >= 2).map(_._1).toSet
        val kept = tk.zipWithIndex.collect {
          case (tok, i0) if !starts.exists(s => s <= i0 + 1 && i0 + 1 < s + n) => tok
        }
        id -> (tk.length.toLong, (tk.length - kept.length).toLong, kept.mkString(" "))
      }
      val got = Extensions16.stripDuplicateSpans(df, "doc_id", "text", n)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
            r.getAs[String]("clean_text"))).toMap
      assert(got == expected, s"seed $seed: span removal diverged from reference")
      assert(got.values.exists(_._2 > 0), s"seed $seed: vacuous (no dup spans generated)")
    }
  }

  test("property: waterfillBudget equals a driver-side reference for random masses") {
    import graft.ops.Extensions20
    import spark.implicits._
    for (seed <- Seq(5, 13, 77)) {
      val rnd = new Random(seed)
      val nSrc = 3 + rnd.nextInt(10)
      val docs = (0 until 120).map { i =>
        (i.toLong, s"src${rnd.nextInt(nSrc)}",
          Seq.fill(1 + rnd.nextInt(20))("tok").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val frac = 0.3 + rnd.nextDouble() * 0.6
      val masses = docs.collect().groupBy(_.getString(1)).view
        .mapValues(_.map(_.getString(2).split(" ").length.toLong).sum).toMap
      val total = masses.values.sum
      val budget = math.floor(total * frac).toLong
      // reference waterfill: exact cap on the sorted ladder
      val sorted = masses.toSeq.sortBy { case (s, m) => (m, s) }
      val refCap: Option[Double] = {
        var cum = 0L
        var found: Option[Double] = None
        for (((_, m), j) <- sorted.zipWithIndex if found.isEmpty) {
          val cap = (budget - cum).toDouble / (sorted.length - j)
          if (cap <= m) found = Some(cap)
          cum += m
        }
        found
      }
      def round4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      val expected = masses.map { case (s, m) =>
        s -> round4(math.min(m.toDouble, refCap.getOrElse(m.toDouble)))
      }
      val got = Extensions20.waterfillBudget(docs, "source", "text", frac)
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("alloc_tokens"))
        .toMap
      assert(got == expected, s"seed $seed: waterfill diverged (cap=$refCap)\n got=$got\n exp=$expected")
      val allocSum = got.values.sum
      assert(math.abs(allocSum - math.min(budget, total)) < got.size * 1e-3,
        s"seed $seed: allocations must exhaust min(budget, total)")
    }
  }

  test("property: clusterSafeSplit never separates a pair, at any permilles") {
    import graft.ops.Extensions19
    import spark.implicits._
    for (seed <- Seq(2, 17)) {
      val rnd = new Random(seed)
      val docs = (0 until 60).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
      val pairs = (0 until 25)
        .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("doc_a", "doc_b")
      val vp = 50 + rnd.nextInt(300); val tp = 50 + rnd.nextInt(300)
      val split = Extensions19.clusterSafeSplit(docs, "doc_id", pairs,
          "doc_a", "doc_b", valPermille = vp, testPermille = tp)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      assert(split.size == 60, "split must cover every doc")
      pairs.collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(split(a) == split(b), s"seed $seed: pair ($a,$b) torn at vp=$vp tp=$tp")
      }
    }
  }
}
