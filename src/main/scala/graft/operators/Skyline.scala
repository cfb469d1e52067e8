package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto skyline (2-D frontier): rows not dominated on a
  * (minimize, maximize) criteria pair — "cheapest for its size class".
  * Part of the extended analytics surface (SURVEY.md §2.7): the
  * multi-criteria shortlist query the reference's SPJU algebra can't
  * express without a quadratic self-join.
  *
  * Dominance: d dominates p iff d.min ≤ p.min ∧ d.max ≥ p.max with at
  * least one strict. Duplicates on both criteria dominate neither way
  * and all survive.
  *
  * Scale design — the naive formulation is a NOT-EXISTS self-join
  * (nested loop, O(n²)); this one never compares row pairs:
  *  1. **Bucket prune (distributed).** `minCol` is quantized into
  *     fixed-width buckets from a 1-row bounds frame (broadcast, never
  *     a driver action). Floor quantization is monotone, so a strictly
  *     earlier bucket means a strictly smaller `minCol`; any row at or
  *     below the running max of `maxCol` over strictly-earlier buckets
  *     is provably dominated and dropped where it sits. The running
  *     max is computed on the B-row bucket-stats frame — the only
  *     window over a global order runs on ≤ B rows.
  *  2. **Exact pass (small).** Survivors get the textbook sweep: keep
  *     a row iff it holds its equal-`minCol` group's best `maxCol` AND
  *     strictly beats the prefix max over all strictly smaller
  *     `minCol` values (`RANGE 1 PRECEDING` — exact because the
  *     criteria are integers). Survivor count is ~|skyline| + O(B) for
  *     real distributions; a huge frontier is output size, which any
  *     engine pays.
  *
  * Contract: both criteria columns must be integral (cents/micros the
  * caller scales) — the strict-prefix RANGE frame relies on it.
  */
object Skyline {

  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
      buckets: Int = 1024): DataFrame = {
    val bounds = df.agg(min(col(minCol).cast("long")).as("_lo"),
      max(col(minCol).cast("long")).as("_hi"))
    val withB = df.crossJoin(broadcast(bounds)) // 1 row by construction
      .withColumn("_bkt",
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise((col(minCol).cast("long") - col("_lo")) * buckets /
            (col("_hi") - col("_lo") + 1)).cast("long"))
    val bucketStats = withB.groupBy("_bkt")
      .agg(max(col(maxCol).cast("long")).as("_bmax"))
    val wb = Window.orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketStats
      .withColumn("_pfx", max(col("_bmax")).over(wb))
      .select("_bkt", "_pfx")
    val cand = withB.join(broadcast(prefix), Seq("_bkt"))
      .filter(col("_pfx").isNull || col(maxCol).cast("long") > col("_pfx"))
    val wStrict = Window.orderBy(col(minCol).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wGroup = Window.partitionBy(col(minCol))
    cand
      .withColumn("_spfx", max(col(maxCol).cast("long")).over(wStrict))
      .withColumn("_gmax", max(col(maxCol).cast("long")).over(wGroup))
      .filter(col(maxCol).cast("long") === col("_gmax") &&
        (col("_spfx").isNull || col(maxCol).cast("long") > col("_spfx")))
      .drop("_bkt", "_pfx", "_spfx", "_gmax", "_lo", "_hi")
  }
}
