package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator — the shuffle-light
  * alternative to `row_number().over(partitionBy(g).orderBy(score))`:
  * the window form shuffles and SORTS every row of every group; this
  * fold gets partial aggregation for free, so each map partition ships
  * at most k (score, id) entries per group and nothing is ever globally
  * sorted. At 100 TB that is the difference between a corpus-sized
  * sort-shuffle and an O(groups · k) one.
  *
  * Ordering: score desc, id asc on ties — the house determinism rule.
  * Buffers stay ≤ k entries (insert-then-trim in reduce, sorted merge),
  * so `merge` is O(k) and commutative + associative by construction.
  */
class TopKFold(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1)

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) // (id, score)

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(b: Seq[(Long, Long)], e: (Long, Long)): Seq[(Long, Long)] =
    if (b.size == k && better(b.last, e)) b
    else (e +: b).sortWith(better).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
