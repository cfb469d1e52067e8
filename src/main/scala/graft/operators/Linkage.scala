package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * bomb: a null-ish or degenerate block value at corpus scale) are
  * dropped whole under a declared pair budget, the same audited-cap
  * pattern as the dedup bucket generators. Three block-keyed shuffles
  * (two counts + the join), each carrying only block keys or the
  * surviving rows.
  */
object Linkage {

  /** Blocked candidate pairs: rows of `a` × rows of `b` that share a
    * block-key tuple, with non-block columns prefixed `a_`/`b_`.
    * Blocks whose pair count `na*nb` exceeds `maxPairs` are dropped
    * entirely (cap, don't sample: deterministic, auditable via
    * [[droppedBlocks]]); null block values never match anything. */
  def candidates(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      maxPairs: Long): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required")
    val notNull = blockCols.map(col(_).isNotNull).reduce(_ && _)
    // materialized once: the admitted-block list is block-count-sized
    // (small by construction) and feeds BOTH semi-joins — without the
    // barrier each side re-runs both count aggregates and their join
    val ok = okBlocks(a, b, blockCols, maxPairs).localCheckpoint(true)
    val af = prefixed(a, blockCols, "a_").join(ok, blockCols, "left_semi")
    val bf = prefixed(b, blockCols, "b_").join(ok, blockCols, "left_semi")
    af.join(bf, blockCols)
  }

  /** The audit side of the cap: blocks excluded by `maxPairs`, with
    * their would-have-been pair counts. */
  def droppedBlocks(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      maxPairs: Long): DataFrame =
    blockCounts(a, b, blockCols).filter(col("n_pairs") > maxPairs)

  private def okBlocks(a: DataFrame, b: DataFrame,
      blockCols: Seq[String], maxPairs: Long): DataFrame =
    blockCounts(a, b, blockCols).filter(col("n_pairs") <= maxPairs)
      .select(blockCols.map(col): _*)

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
