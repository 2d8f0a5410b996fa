package graft.state

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.model.{Event, Player, Schemas}
import graft.log.EventLog

/** The engine's core operator: per-aggregate event fold → current state.
  *
  * This is what the reference's query service does by consuming the Kafka
  * topic into an in-memory read model (reference: start_container.sh:95 —
  * the query container is wired to Kafka only, no durable store; observed
  * latest-wins semantics PlayerResourceIT.java:148-171).
  *
  * Two interchangeable formulations, both shuffle-once on the aggregate key:
  *
  *  - [[latestState]]: `max_by(struct(cols), orderCol)` — a hash aggregate
  *    with map-side partial aggregation. At scale this is the right default:
  *    each input partition reduces to ≤ |distinct keys in partition| rows
  *    before the exchange, so the shuffle carries states, not events.
  *
  *  - [[latestStateWindow]]: `row_number() over (partition by key order by
  *    ver desc) = 1` — shuffles *every* event and sorts each partition.
  *    Kept because it is the standard SQL phrasing (and the DuckDB oracle
  *    form), and for tie-diagnosis; do not prefer it at 100 TB.
  *
  * Order-insensitivity: the fold orders by `version` explicitly, so the
  * engine does not depend on arrival order — unlike the reference, which
  * leaned on a single Kafka partition for total order
  * (start_container.sh:56). That is what frees us to parallelize.
  */
object Materialize {

  /** A1/A4 generic form: one current-state row per `keyCol`, the row with the
    * maximal `orderCol` winning. One-pass partial+final hash aggregate.
    */
  def latestState(events: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val payload = struct(events.columns.map(col).toIndexedSeq: _*)
    events
      .groupBy(col(keyCol))
      .agg(max_by(payload, col(orderCol)).as("s"))
      .select(events.columns.map(c => col(s"s.$c").as(c)).toIndexedSeq: _*)
  }

  /** Window/row_number formulation — standard SQL phrasing of the same fold. */
  def latestStateWindow(events: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).desc)
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Reference-shaped read model: fold Player* events into live players.
    * Mirrors the observed CRUD semantics end to end
    * (PlayerResourceIT.java:109-190):
    *  - PK-duplicate redelivery collapses first (A2, initial_db.sql:11);
    *  - latest version wins (update visible on re-read, IT:148-161);
    *  - a delete event tombstones the aggregate out of findAll (M3);
    *  - deleting a never-created id leaves no trace (IT:174-179 — the id
    *    only ever has a delete event, whose tombstone yields no row).
    */
  def playerState(events: DataFrame): DataFrame = {
    val deduped = EventLog.pkDedup(events)
    val last = latestState(deduped, "id", "version")
    last
      .filter(not(col("name").endsWith("Deleted")))
      .select(
        col("id"),
        get_json_object(col("data"), "$.firstName").as("firstName"),
        get_json_object(col("data"), "$.lastName").as("lastName"))
  }

  /** findById (P1): equality predicate on the materialization key. Filtering
    * the *events* before the fold lets Catalyst push `id = x` into the
    * Parquet scan (row-group pruning — the analog of Cassandra partition-key
    * addressing, initial_db.sql:11).
    */
  def findById(events: DataFrame, id: Long): DataFrame =
    playerState(events.filter(col("id") === lit(id)))

  /** findAll (P2): the flagship full materialization
    * (PlayerResourceIT.java:164-171).
    */
  def findAll(events: DataFrame): DataFrame =
    playerState(events).orderBy("id")

  /** Point-in-time read: the state every aggregate HAD when `orderCol`
    * (a version or an event-time column) was ≤ `bound` — the audit /
    * time-travel read an append-only log supports for free and a
    * mutable table cannot. Same one-shuffle fold as [[latestState]];
    * the bound is a scan-pushed predicate (row-group pruning when the
    * log is sorted by the order column, as [[EventLog.append]] lays
    * out).
    *
    * Replay consistency (spec-asserted): asOfState at bound B equals
    * latestState of the log's prefix up to B — so any historical
    * snapshot can be reproduced exactly, which is what makes the event
    * log the system of record.
    */
  def asOfState(
      events: DataFrame, keyCol: String, orderCol: String,
      bound: Column): DataFrame =
    latestState(events.filter(col(orderCol) <= bound), keyCol, orderCol)

  // -------------------------------------------------------------------------
  // Typed fold: the direct analog of the query service's event-apply function
  // (§2.10). An Aggregator is Spark's public, Encoder-backed UDAF surface —
  // it gets partial aggregation (reduce/merge) for free, so the shuffle
  // carries one buffer per key per map partition.
  // -------------------------------------------------------------------------

  /** Mutable-free fold buffer: the winning (version, name, data) so far. */
  final case class FoldBuf(version: Long, name: String, data: String)

  /** Latest-wins fold as a typed Aggregator[Event, FoldBuf, Option[Player]].
    * `reduce`/`merge` keep the max-version event; `finish` parses the payload
    * and applies tombstone semantics. Commutative + associative ⇒ replay
    * order never matters (ScalaCheck property in MaterializeSpec).
    */
  class PlayerFold extends Aggregator[Event, FoldBuf, Option[Player]] {
    override def zero: FoldBuf = FoldBuf(Long.MinValue, null, null)
    override def reduce(b: FoldBuf, e: Event): FoldBuf =
      if (e.version > b.version) FoldBuf(e.version, e.name, e.data) else b
    override def merge(a: FoldBuf, b: FoldBuf): FoldBuf =
      if (a.version >= b.version) a else b
    override def finish(b: FoldBuf): Option[Player] =
      if (b.name == null || b.name.endsWith("Deleted")) None
      else Some(Player(0L, jsonField(b.data, "firstName"), jsonField(b.data, "lastName")))
    override def bufferEncoder: Encoder[FoldBuf] = Encoders.product[FoldBuf]
    override def outputEncoder: Encoder[Option[Player]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Minimal JSON field extraction for the typed path (payloads are flat
    * string-valued objects, PlayerResourceIT.java:116-120). The DataFrame
    * path uses `get_json_object`; this avoids dragging a JSON library into
    * the typed fold.
    */
  private[graft] def jsonField(json: String, field: String): String = {
    if (json == null) return null
    val m = ("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(json).map(_.group(1)).orNull
  }

  /** Typed-path materialization: groupByKey on the aggregate id + the fold.
    * Same shuffle shape as [[latestState]] (partial buffers per key).
    */
  def playerStateTyped(events: Dataset[Event]): Dataset[Player] = {
    val spark = events.sparkSession
    import spark.implicits._
    val fold = new PlayerFold().toColumn
    events
      .groupByKey(_.id)
      .agg(fold.name("state"))
      .flatMap { case (id, st) => st.map(_.copy(id = id)) }
  }
}
