package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesSketch.misra_gries
import graft.functions.TextFunctions

/** Exact corpus-level heavy hitters (most frequent tokens) in two
  * bounded passes — the vocabulary-statistics operator a training-data
  * pipeline runs over raw text.
  *
  * A plain `groupBy(token).count().orderBy(...).limit(k)` shuffles the
  * ENTIRE token stream and keeps a counter per distinct token: at
  * 100 TB with a web-scale vocabulary that is the whole corpus through
  * the wire and an unbounded hash table. Instead:
  *
  *  1. **Sketch pass**: one scan aggregated through the Misra–Gries
  *     summary ([[graft.functions.MisraGriesSketch]]) — O(capacity)
  *     memory per task, one tiny row to the driver. Every token with
  *     frequency > N/(capacity+1) is guaranteed present.
  *  2. **Rescore pass**: exact counts for ONLY the ≤ capacity
  *     candidates (an `isin` filter the scan evaluates before any
  *     shuffle), then top-k of those exact counts.
  *
  * Whenever the true k-th frequency clears the sketch bound — always,
  * for sane capacity sizing, e.g. capacity ≥ 2·N/f_k — the result is
  * provably the EXACT top-k (the driver oracle is the naive full
  * groupBy). The only corpus-wide shuffle is over candidate tokens
  * only.
  */
object HeavyHitters {

  /** Top-`k` tokens of the corpus by exact count, candidates found by
    * a capacity-bounded Misra–Gries sketch. Deterministic total order:
    * (count DESC, token ASC). */
  def topTokens(docs: DataFrame, k: Int = 20,
      capacity: Int = 64): DataFrame = {
    val toks = docs.select(
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    // pass 1: one bounded summary row to the driver (like an IVF
    // centroid model — the ONLY collect, ≤ capacity entries)
    val sketch = toks.agg(misra_gries(col("tok"), capacity).as("mg"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val candidates = sketch.map(_.getString(0))
    // pass 2: exact counts for candidates only; the isin predicate is
    // evaluated in the scan stage so non-candidate tokens never shuffle
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(k)
  }
}
