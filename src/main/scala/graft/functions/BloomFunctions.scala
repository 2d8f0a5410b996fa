package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's built-in Bloom-filter sketch expressions
  * (the machinery behind runtime bloom-filter join pruning, exposed here
  * for explicit use). `bloomFilterAgg` is a partial-aggregating sketch
  * build — each partition fills a local filter, merges combine bitwise —
  * so a corpus-membership filter costs one map-side pass regardless of
  * corpus size; `mightContain` is the O(1) probe. No false negatives:
  * a `false` probe is PROOF of absence, which is what makes Bloom
  * prefilter + exact verify return exactly the exact-join answer.
  */
object BloomFunctions {

  /** Aggregate a `xxhash64`-hashed LONG column into a Bloom filter
    * (binary). Size the filter to the expected distinct count — fpp only
    * costs extra verification work, never correctness.
    */
  def bloomFilterAgg(hashed: Column, expectedItems: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(GraftSqlBridge.expression(hashed), expectedItems)
        .toAggregateExpression())

  /** Membership probe: `bloom` must be a foldable binary (e.g. `lit` of a
    * built filter), `hashed` the same `xxhash64` the filter was built on.
    */
  def mightContain(bloom: Column, hashed: Column): Column =
    GraftSqlBridge.column(
      BloomFilterMightContain(
        GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(hashed)))
}
