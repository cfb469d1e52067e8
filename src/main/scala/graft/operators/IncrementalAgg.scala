package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Incremental aggregate maintenance — the ingest-loop pattern for
  * statistics: persist the ALGEBRAIC partial state of an aggregate
  * (counts and sums — anything where merge(partial(A), partial(B)) =
  * partial(A ∪ B)), and fold each arriving epoch into it without ever
  * rescanning the historical corpus. The dedup family has this story
  * through its persisted minhash index; this is the same contract for
  * the per-source corpus statistics every curation report ends with.
  *
  * At 100 TB the difference is the whole game: a nightly "tokens per
  * source" report that rescans the corpus costs a full pass per day;
  * maintained state costs one pass over the increment plus a merge of
  * |sources| rows. The state table is itself the partial aggregate, so
  * the merge is a groupBy over (existing state ∪ increment partials) —
  * tiny by construction (rows ∝ distinct sources, not documents).
  *
  * Everything persisted is exact integers (counts, token counts, char
  * counts) — algebraic, associative, overflow-checked by the BIGINT
  * range — so merged state is bit-equal to a from-scratch recompute,
  * which is exactly what the declared oracle asserts. */
object IncrementalAgg {

  /** The partial state of one document batch: per-source doc count,
    * token mass and char mass. Token counting runs in the scan stage;
    * the aggregate shuffles |sources| rows after map-side combine. */
  def docStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("nt"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nc")).as("total_chars"))

  /** Persist the state table (overwrite = this epoch's checkpoint). */
  def writeState(docs: DataFrame, dir: String): Unit =
    docStats(docs).write.mode("overwrite").parquet(dir)

  /** Fold an increment into persisted state WITHOUT touching the
    * historical documents: read the |sources|-row state, union the
    * increment's partials, re-aggregate. The merged frame is the next
    * epoch's state (callers typically `writeState`-equivalent it back
    * via `.write`). */
  def mergeIncrement(spark: SparkSession, stateDir: String,
      increment: DataFrame): DataFrame =
    spark.read.parquet(stateDir)
      .unionByName(docStats(increment))
      .groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("total_chars")).as("total_chars"))

  // --- Distinct counts: the same maintenance loop for a NON-algebraic
  // aggregate, carried by its mergeable sketch. COUNT(DISTINCT) can't
  // be maintained from counts (merging loses cross-epoch overlap);
  // the HLL sketch is exactly the bounded state that can — union of
  // sketches = sketch of the union, order- and layout-independent.
  // State stays |sources| rows × ~4 KB however many epochs fold in.

  /** Per-source distinct-document sketch (over the normalized-text
    * fingerprint) for one batch. */
  def distinctState(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        TextFunctions.fingerprint64(col("text")).as("fp"))
      .groupBy("source")
      .agg(hll_sketch_agg(col("fp")).as("fp_sketch"))

  def writeDistinctState(docs: DataFrame, dir: String): Unit =
    distinctState(docs).write.mode("overwrite").parquet(dir)

  /** Fold an increment's sketches into persisted sketch state — the
    * historical documents are never reread; cross-epoch duplicate
    * documents are absorbed by the union (which a count-based state
    * could never do). */
  def mergeDistinctIncrement(spark: SparkSession, stateDir: String,
      increment: DataFrame): DataFrame =
    spark.read.parquet(stateDir)
      .unionByName(distinctState(increment))
      .groupBy("source")
      .agg(hll_union_agg(col("fp_sketch")).as("fp_sketch"))

  // --- Quantiles: the maintenance loop for an ORDER STATISTIC. A
  // quantile is neither algebraic nor sketchable into counts alone,
  // but a fixed-bin histogram IS a mergeable exact state: bins sum
  // across epochs, and the histogram quantile (upper edge of the bin
  // holding the rank-threshold value) is a deterministic integer
  // function of the merged bins — reproducible across engines and
  // parallelism, unlike any interpolating float percentile. Error is
  // bounded by construction: the true rank value lies inside the
  // chosen bin, so |estimate − exact| < binWidth always. State stays
  // |sources| × nBins rows however many epochs fold in.

  /** Per-(source, bin) counts of the per-document token count for one
    * batch. Values ≥ binWidth·nBins clamp into the top bin. */
  def histState(docs: DataFrame, binWidth: Int = 16,
      nBins: Int = 64): DataFrame = {
    require(binWidth >= 1 && nBins >= 2, "need binWidth >= 1, nBins >= 2")
    docs
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("v"))
      .withColumn("bin",
        least(expr(s"v div $binWidth"), lit(nBins - 1L)))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("cnt"))
  }

  def writeHistState(docs: DataFrame, dir: String, binWidth: Int = 16,
      nBins: Int = 64): Unit =
    histState(docs, binWidth, nBins).write.mode("overwrite").parquet(dir)

  /** Fold an increment's histogram into persisted state — bins sum. */
  def mergeHistIncrement(spark: SparkSession, stateDir: String,
      increment: DataFrame, binWidth: Int = 16,
      nBins: Int = 64): DataFrame =
    spark.read.parquet(stateDir)
      .unionByName(histState(increment, binWidth, nBins))
      .groupBy("source", "bin")
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from merged histogram state: for each basis-
    * point probability p, the UPPER EDGE of the first bin whose
    * running count reaches threshold = ceil(p·total/10000) — all
    * integer arithmetic (the ceil is (p·total + 9999) div 10000), so
    * the estimate is exact-replayable. One bin-ordered window per
    * source (state is |sources|·nBins rows — negligible at any corpus
    * size) and one min-aggregate per (source, p). */
  def histQuantiles(state: DataFrame, binWidth: Int,
      pbps: Seq[Int]): DataFrame = {
    require(pbps.nonEmpty && pbps.forall(p => p >= 1 && p <= 10000),
      "probabilities are basis points in [1, 10000]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("source")
    val cum = state
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wTot))
    val perP = pbps.map { p =>
      cum.filter(
          col("cum") >= expr(s"($p * total + 9999) div 10000"))
        .groupBy(col("source"), col("total").as("n_values"))
        .agg(((min(col("bin")) + 1) * binWidth).as(s"p${p}_upper"))
    }
    perP.reduce(_.join(_, Seq("source", "n_values")))
  }
}
