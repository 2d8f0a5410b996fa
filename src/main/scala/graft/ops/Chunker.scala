package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE strided token-window chunker (round-14 consolidation): x36
  * ([[Extensions4.chunkDocuments]]), x240
  * ([[Extensions105.chunkDocuments]]) and x333
  * ([[Extensions146.chunkText]]) are thin adapters over [[strided]] —
  * the deltas are tokenization (raw vs lowercased, empty tokens kept vs
  * dropped) and the TAIL POLICY, which is the real semantic fork:
  *
  *  - [[ShortTail]] (x36): a chunk starts every `stride` tokens while
  *    any token remains; tail chunks run short. Right before packing,
  *    where the packer absorbs ragged ends.
  *  - [[ClampedTail]] (x240): the last start clamps back so the final
  *    chunk is always full-size (it overlaps more instead of running
  *    short). For uniform-window consumers — embedding models,
  *    fixed-shape batches — where a short tail is a wasted slot.
  *  - [[TrimmedTail]] (x333): tail chunks may run short, but a chunk is
  *    emitted only when it contains at least one token PAST the previous
  *    chunk's overlap — a trailing chunk that is a strict subset of its
  *    predecessor (docLen mod stride ∈ [1, overlap]) is never emitted,
  *    so a RAG index built on the chunks carries no fully-redundant
  *    entry.
  *
  * Scale: map-only — tokenize once, explode per-doc starts, slice. No
  * shuffle, no state; output volume is corpus × (1 + overlap/stride)
  * tokens.
  */
object Chunker {

  sealed trait Tail
  case object ShortTail extends Tail
  case object ClampedTail extends Tail
  case object TrimmedTail extends Tail

  /** Generic strided chunking to (doc_id, chunk_idx, start0, n_toks,
    * chunk_text) — `start0` is the 0-based token offset; adapters
    * rename/rebase. `window` is the chunk length in tokens; a new chunk
    * starts every `stride` tokens (overlap = window − stride).
    */
  def strided(
      corpus: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int, lowercase: Boolean,
      dropEmptyTokens: Boolean, tail: Tail): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"Chunker.strided: need 1 <= stride <= window, " +
        s"got window=$window stride=$stride")
    val overlap = window - stride
    val rawToks = split(
      if (lowercase) lower(col(textCol)) else col(textCol), " ")
    val toks =
      if (dropEmptyTokens) filter(rawToks, t => length(t) > 0) else rawToks
    val base0 = corpus.select(col(idCol).as("doc_id"), toks.as("tk"))
    val base =
      if (dropEmptyTokens) base0.filter(size(col("tk")) > 0) else base0
    val starts: Column = tail match {
      case ShortTail =>
        sequence(lit(0), greatest(size(col("tk")) - 1, lit(0)), lit(stride))
      case ClampedTail =>
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("tk")) - overlap, lit(1)),
            lit(stride)),
          s => least(s, greatest(size(col("tk")) - window + 1, lit(1))) - 1))
      case TrimmedTail =>
        // the last emitted index is ⌊(len − overlap − 1)/stride⌋ ∨ 0: a
        // chunk exists only while it owns a token past the previous
        // chunk's overlap (integer DIV — Divide is double in Column land)
        expr(s"transform(sequence(0L, greatest(" +
          s"CAST(size(tk) - $overlap - 1 AS BIGINT) DIV $stride, 0L))," +
          s" i -> i * ${stride}L)")
    }
    base
      .select(col("doc_id"), col("tk"),
        posexplode(starts).as(Seq("chunk_idx", "start0")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start0").cast("long").as("start0"),
        slice(col("tk"), (col("start0") + 1).cast("int"), lit(window))
          .as("ck"))
      .select(col("doc_id"), col("chunk_idx"), col("start0"),
        size(col("ck")).cast("long").as("n_toks"),
        concat_ws(" ", col("ck")).as("chunk_text"))
  }
}
