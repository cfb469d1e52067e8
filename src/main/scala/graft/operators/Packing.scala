package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing — the step between a cleaned corpus and a
  * pretraining data loader: concatenate documents in a deterministic
  * pseudo-random order and cut the token stream into fixed-length
  * training sequences (the classic concat-then-chunk regime, where a
  * document may straddle a sequence boundary and a sequence may hold
  * many short documents — zero padding waste by construction).
  *
  * The output is a *manifest*, not the packed tensors: for every
  * document, which shard it landed in, its token span's first and last
  * sequence number within that shard, and its offset inside the first
  * sequence. A loader (or a downstream job) materializes sequence
  * `(shard, seq)` by concatenating exactly the manifest rows with
  * `start_seq <= seq <= end_seq` in stream order — so the manifest IS
  * the packing decision, in one pass, with nothing token-level ever
  * shuffled.
  *
  * Scale design: a single GLOBAL concatenation order would need a
  * global sort — one range exchange over the full corpus, with one
  * straggling reducer chain at 100 TB. Instead the stream is sharded by
  * `xxhash64(doc_id) mod nShards` (deterministic, data-independent) and
  * each shard packs independently: ONE hash-partition shuffle, each
  * shard's window sort local to its partition, shards embarrassingly
  * parallel. Within a shard, order is `(xxhash64(doc_id), doc_id)` — a
  * stable pseudo-random interleave, so adjacent raw documents (often
  * near-duplicates from the same crawl) land in different sequences,
  * which is exactly why loaders shuffle-before-pack in the first place.
  * Token counting runs in the scan stage (codegen'd split/filter/size);
  * only `(doc_id, n_tokens, hash)` ever reaches the exchange.
  *
  * Reference scope note: the reference engine has no notion of token
  * streams (its algebra stops at relational ops, `RPC/RPC/RPC.cs:20-28`)
  * — this operator is part of the training-data pipeline surface the
  * rebuild adds on top.
  */
object Packing {

  /** Packing manifest for `docs(doc_id, text)` at `seqLen` tokens per
    * training sequence across `nShards` independent streams.
    *
    * Empty documents (zero tokens) occupy no span and are dropped —
    * they cannot appear in any packed sequence.
    *
    * Output: `(doc_id, shard, n_tokens, start_seq, end_seq,
    * offset_in_seq)`, ordered by `doc_id`. `start_seq`/`end_seq` are
    * 0-based sequence numbers within the shard; `offset_in_seq` is the
    * document's first token's position inside sequence `start_seq`.
    */
  def packManifest(docs: DataFrame, seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val base = docs
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        xxhash64(col("doc_id")).as("h"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy("shard")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start_off div $seqLen").as("start_seq"),
        expr(s"(end_off - 1) div $seqLen").as("end_seq"),
        pmod(col("start_off"), lit(seqLen.toLong)).as("offset_in_seq"))
  }

  /** Per-sequence composition of a manifest — the loader-side
    * expansion: sequence number → which documents fill it. Emits
    * `(shard, seq, n_docs, first_doc_id, last_doc_id)` (doc-id range
    * as the summary; the manifest itself carries exact order); a
    * document contributes to every sequence in `[start_seq, end_seq]`.
    * The explode is bounded by
    * `n_tokens/seqLen + 1` rows per document — token mass, not
    * document count, controls the fan-out, and it distributes with the
    * manifest (no shuffle beyond the final group). */
  def sequenceIndex(manifest: DataFrame): DataFrame =
    manifest
      .select(col("shard"), col("doc_id"),
        explode(sequence(col("start_seq"), col("end_seq"))).as("seq"))
      .groupBy("shard", "seq")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc_id"),
        max(col("doc_id")).as("last_doc_id"))
}
