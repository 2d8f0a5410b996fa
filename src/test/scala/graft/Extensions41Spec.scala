package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions41

/** Batch-41 invariants: the corruption is lossless (input + target
  * reconstruct the document exactly), sentinels are ordinal, the mask
  * rate lands near its permille, and the generator is deterministic.
  */
class Extensions41Spec extends SparkSpec {

  /** Reconstruct the original token stream by splicing each sentinel's
    * span from the target back into the input.
    */
  private def reconstruct(input: String, target: String): String = {
    val spans = target.split("<extra_id_").filter(_.nonEmpty).map { part =>
      val idx = part.takeWhile(_ != '>')
      idx.toInt -> part.dropWhile(_ != '>').drop(1).trim
    }.toMap
    "<extra_id_(\\d+)>".r.replaceAllIn(input,
      m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toInt)))
  }

  test("x117 lossless: splicing the target spans back into the input restores every document") {
    val out = SparkEntry.queries("x117_span_corruption")(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", filter(split(lower(col("text")), " "),
          t => length(t) > 0)).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, inp, tgt) = (r.getLong(0), r.getString(4), r.getString(5))
      assert(reconstruct(inp, tgt) == docs(id),
        s"doc $id must reconstruct exactly")
      // sentinel ordinals are 0..n_spans-1 in both input and target
      val n = r.getLong(2).toInt
      (0 until n).foreach { k =>
        assert(inp.contains(s"<extra_id_$k>") && tgt.contains(s"<extra_id_$k>"),
          s"doc $id missing sentinel $k")
      }
      assert(!inp.contains(s"<extra_id_$n>"), s"doc $id has an extra sentinel")
    }
  }

  test("x117 mask rate lands near 15% of blocks; counts are consistent") {
    val out = SparkEntry.queries("x117_span_corruption")(spark, sf0001).collect()
    val blocks = out.map(r => math.ceil(r.getLong(1) / 3.0).toLong).sum
    val spans = out.map(_.getLong(2)).sum
    val rate = spans.toDouble / blocks
    assert(rate > 0.10 && rate < 0.20, s"mask rate ~0.15, got $rate")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "masked tokens never exceed tokens")
      assert(r.getLong(3) >= r.getLong(2), "a span masks at least one token")
    }
  }

  test("x117 determinism under repartitioning") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Extensions41.spanCorruptionPairs(d, "doc_id", "text")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Extensions41.spanCorruptionPairs(d.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }
}
