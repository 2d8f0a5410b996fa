package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions67

/** Batch-67 invariants: the Markov eval scores a learnable planted
  * chain perfectly and an adversarial flip at zero; the dedup funnel
  * removes planted exact and near copies at exactly the right stages.
  */
class Extensions67Spec extends SparkSpec {

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "ts0", "event_type")
      .select(col("user_id"), to_timestamp(col("ts0")).as("ts"),
        col("event_type"))
  }

  test("x166 planted: a deterministic cycle predicts perfectly across the split") {
    // users repeat a -> b -> a -> b ...; split mid-sequence
    val rows = (1 to 3).flatMap { u =>
      (0 until 10).map { i =>
        (u.toLong, f"2024-03-${i + 1}%02d 10:00:00",
          if (i % 2 == 0) "a" else "b")
      }
    }
    val out = Extensions67.markovNextEventEval(ev(rows: _*), "user_id", "ts",
      "event_type", "2024-03-06 00:00:00").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getString(1) == "b" && out("b").getString(1) == "a")
    assert(out("a").getDouble(5) == 1.0 && out("b").getDouble(5) == 1.0,
      s"cycle predicts perfectly: $out")
  }

  test("x166 planted: a behavior flip at the split scores zero") {
    // pre-split: a -> b always; post-split: a -> c always
    val pre = (0 until 6).map(i =>
      (1L, f"2024-03-0${i / 2 + 1}%s 0$i:00:00".replace("%s", ""),
        if (i % 2 == 0) "a" else "b"))
    val post = (0 until 4).map(i =>
      (1L, f"2024-03-2${i / 2}%s 0$i:30:00".replace("%s", ""),
        if (i % 2 == 0) "a" else "c"))
    val out = Extensions67.markovNextEventEval(ev(pre ++ post: _*),
      "user_id", "ts", "event_type", "2024-03-10 00:00:00").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getString(1) == "b", "model learned the OLD behavior")
    assert(a.getLong(4) == 0 && a.getDouble(5) == 0.0,
      s"flipped behavior scores zero: $a")
  }

  test("x167 planted: exact copies die at stage 1, near copies at stage 2") {
    import spark.implicits._
    val base = (1L to 10L).map { i =>
      (i, (1 to 60).map(j => s"w${i}_$j").mkString(" "))
    }
    val exactCopies = base.take(3).map { case (i, t) => (i + 100L, t) }
    val nearCopies = base.take(2).map { case (i, t) =>
      (i + 200L, t + " zz1 zz2 zz3 zz4 zz5")
    }
    val out = Extensions67.dedupFunnelCard(
      (base ++ exactCopies ++ nearCopies).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out.length == 3)
    assert(out(0).getLong(2) == 15L, "raw = 10 + 3 + 2")
    assert(out(1).getLong(2) == 12L, "exact stage removes the 3 identical copies")
    assert(out(2).getLong(2) == 10L, "near stage removes the 2 appended copies")
    assert(out(2).getDouble(4) == 0.6667, "10/15 docs survive")
  }

  test("x167 fixture: monotone funnel, fractions consistent") {
    val out = SparkEntry.queries("x167_dedup_funnel")(spark, sf0001).collect()
    assert(out.length == 3)
    val docs = out.map(_.getLong(2)).toSeq
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a })
    assert(out(0).getDouble(4) == 1.0 && out(0).getDouble(5) == 1.0)
    assert(docs(0) - docs(1) >= 71, "the ~500/7 planted exact copies die")
  }
}
