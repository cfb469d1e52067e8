package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Iterate.MaterializeOps

/** Record linkage across two tables that share no key — the classic
  * ER pipeline: blocking to bound the candidate space, then per-field
  * agreement scoring over the candidates (the Fellegi–Sunter shape
  * with deterministic integer weights, so every score is
  * engine-reproducible).
  *
  * This object owns the CANDIDATE GENERATION half; scoring is a plain
  * Column the caller composes over the prefixed pair columns — field
  * weights are policy, not engine.
  *
  * Scale shape: candidates come from an equi-join on the block key —
  * never an all-pairs product. Oversized blocks (a cross product
  * bomb: a null-ish or degenerate block value at corpus scale) degrade
  * to a DETERMINISTIC truncation — each side keeps its first
  * floor(sqrt(maxPairs)) rows in lexicographic order — instead of
  * dropping whole: the round-9 sf10 rehearsal showed drop-whole is a
  * zero-output cliff (a replicated corpus pushes EVERY block past the
  * budget and the operator silently answers nothing — the same cliff
  * the ngram pair budget closed in round 8). Within-budget blocks are
  * untouched, so gate-scale outputs are bit-identical to the
  * drop-whole era. Four block-keyed shuffles (two counts, the whole-
  * block join, the truncation window over overflowing members only),
  * each carrying only block keys or the surviving rows.
  */
object Linkage {

  /** Blocked candidate pairs: rows of `a` × rows of `b` that share a
    * block-key tuple, with non-block columns prefixed `a_`/`b_`.
    * Blocks whose pair count `na*nb` exceeds `maxPairs` are truncated,
    * not dropped: each side keeps its first `floor(sqrt(maxPairs))`
    * rows under the lexicographic order of the prefixed non-block
    * columns (deterministic at any partitioning; callers putting a
    * unique key first get keep-smallest-keys), so the block
    * contributes at most `maxPairs` pairs while the budget can never
    * zero the answer. Auditable via [[droppedBlocks]]; null block
    * values never match anything. */
  def candidates(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      maxPairs: Long): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required")
    // materialized once: the block-count frame is block-count-sized
    // (small by construction) and feeds all four semi-joins — without
    // the barrier each side re-runs both count aggregates and their
    // join
    val counts = blockCounts(a, b, blockCols).materialized()
    val ok = counts.filter(col("n_pairs") <= maxPairs)
      .select(blockCols.map(col): _*)
    val over = counts.filter(col("n_pairs") > maxPairs)
      .select(blockCols.map(col): _*)
    val sideCap = math.max(1L, math.sqrt(maxPairs.toDouble).toLong)
    def side(df: DataFrame, p: String): DataFrame = {
      val pf = prefixed(df, blockCols, p)
      val whole = pf.join(ok, blockCols, "left_semi")
      // truncation window runs over OVERFLOWING-block members only —
      // at most (#over-blocks × occupancy) rows cross this exchange,
      // and the kept set is order-independent (lexicographic rank)
      val ord = pf.columns.filterNot(blockCols.contains).map(col)
      val w = Window.partitionBy(blockCols.map(col): _*)
        .orderBy(ord: _*)
      val truncated = pf.join(over, blockCols, "left_semi")
        .withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") <= sideCap)
        .drop("__graft_rn")
      whole.unionByName(truncated)
    }
    side(a, "a_").join(side(b, "b_"), blockCols)
  }

  /** The audit side of the budget: blocks truncated under `maxPairs`,
    * with their would-have-been pair counts. */
  def droppedBlocks(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      maxPairs: Long): DataFrame =
    blockCounts(a, b, blockCols).filter(col("n_pairs") > maxPairs)

  private def blockCounts(a: DataFrame, b: DataFrame,
      blockCols: Seq[String]): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(blockCols.map(col): _*)
        .agg(count(lit(1)).as(as))
    counts(a, "na").join(counts(b, "nb"), blockCols)
      .withColumn("n_pairs", col("na") * col("nb"))
  }

  private def prefixed(df: DataFrame, blockCols: Seq[String],
      p: String): DataFrame =
    df.filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .select(blockCols.map(col) ++
        df.columns.filterNot(blockCols.contains)
          .map(c => col(c).as(s"$p$c")): _*)
}
