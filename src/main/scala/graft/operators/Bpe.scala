package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import Iterate.MaterializeOps

/** Distributed BPE merge training (Sennrich et al. 2016) — learn the
  * top-`rounds` byte-pair merges from the corpus, the vocabulary-
  * construction step every subword tokenizer pipeline runs before
  * anything can be tokenized.
  *
  * Per round: (1) weighted adjacent-pair counts over the word
  * vocabulary — the corpus itself is touched ONCE ever, to build the
  * (word, freq) vocab; every round after that works on the vocab
  * frame, which is orders of magnitude smaller; (2) a struct-max
  * argmax with a pinned (count desc, pair desc) tie-break — async
  * tie-breaks would make training run-order-dependent; (3) the merge
  * applied by the exact left-to-right non-overlapping list fold
  * ([[VectorFunctions.BpeMergePair]]) with the winning pair captured
  * as literals — ONE driver row per round (the kmeans-centroid
  * pattern), never the data.
  *
  * The result frame unions the per-round argmax aggregates, so the
  * merge table itself is computed distributed and an external engine
  * can re-derive every round from scratch (pair counts, argmax AND
  * fold — see the `bpe_train` oracle's recursive CTEs).
  */
object Bpe {

  /** @return one row per learned merge: (round, pair "a b", count) */
  def train(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    var syms = vocab.withColumn("s",
      expr("filter(split(tok, ''), x -> x <> '')"))
    val perRound = (1 to rounds).map { r =>
      val pairs = syms.filter(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))"))
          .as("p"))
        .groupBy("p").agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .agg(max(struct(col("cnt"), col("p"))).as("m"))
        .select(lit(r.toLong).as("round"), col("m.p").as("pair"),
          col("m.cnt").as("cnt"))
      // the ONE driver row this round: the winning pair, needed as a
      // literal inside the next round's fold expression. This per-round
      // driver round-trip is the accepted cost of BPE — merge r+1's
      // pair counts are defined on the state AFTER merge r, so rounds
      // cannot be batched without changing the learned vocabulary
      // (reference trainers are equally sequential). What scales it:
      // every round touches only the VOCAB frame (distinct words ×
      // symbol arrays, orders of magnitude smaller than the corpus,
      // and shrinking as merges fuse symbols), never the corpus.
      val row = best.collect()(0)
      val Array(a, b) = row.getString(1).split(" ", 2)
      syms = syms.withColumn("s",
        VectorFunctions.bpe_merge(col("s"), a, b))
      // truncate the merge-chain lineage periodically: without this,
      // round r re-applies all r-1 prior folds to the raw vocab (an
      // O(rounds²) recompute); a materialized vocab-sized snapshot
      // every 8 rounds bounds it at O(rounds·8) fold applications
      if (r % 8 == 0 && r < rounds) syms = syms.materialized(r)
      best
    }
    perRound.reduce(_.unionByName(_))
  }

  /** The trained symbol state (word, freq, merged symbols joined by
    * spaces) after `rounds` merges — for specs and downstream
    * segmentation. */
  def symbolState(docs: DataFrame, rounds: Int): DataFrame = {
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    var syms = vocab.withColumn("s",
      expr("filter(split(tok, ''), x -> x <> '')"))
    train(docs, rounds).collect().sortBy(_.getLong(0)).foreach { m =>
      val Array(a, b) = m.getString(1).split(" ", 2)
      syms = syms.withColumn("s",
        VectorFunctions.bpe_merge(col("s"), a, b))
    }
    syms.select(col("tok"), col("freq"),
      array_join(col("s"), " ").as("segmented"))
  }
}
