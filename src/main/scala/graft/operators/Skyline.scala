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
  *  2. **Exact pass (bucket-local).** Survivors get the textbook
  *     sweep: keep a row iff it holds its equal-`minCol` group's best
  *     `maxCol` AND strictly beats the prefix max over all strictly
  *     smaller `minCol` values. The sweep is decomposed so it never
  *     needs a global order: a per-(bucket, value) hash aggregate,
  *     a per-bucket window over the bucket's DISTINCT values, and the
  *     cross-bucket prefix from step 1 — even a corpus whose frontier
  *     is the whole table (anti-correlated criteria) sorts at most
  *     one bucket's distinct values per partition.
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
    // Exact pass, decomposed so no stage has an unpartitioned window
    // over an unbounded set (an adversarial all-frontier corpus used
    // to funnel every candidate into ONE partition here):
    //  a. per-(bucket, minCol-value) max of maxCol — a hash aggregate,
    //     map-side combined, skew-safe;
    //  b. the strict-prefix max over strictly smaller minCol, split
    //     into a within-bucket part (_lpfx: a window PARTITIONED by
    //     bucket over the bucket's DISTINCT minCol values — heavy
    //     duplication collapses in the aggregate before any sort) and
    //     the cross-bucket part (_pfx, already computed on the B-row
    //     bucket frame). A strictly earlier bucket holds only strictly
    //     smaller values (floor quantization is monotone) and equal
    //     values always share a bucket, so the two parts cover exactly
    //     the strictly-smaller rows — max of the two is the old
    //     partition-less RANGE-frame result.
    val wLocal = Window.partitionBy("_bkt").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val values = cand
      .select(col("_bkt"), col(minCol).cast("long").as("_v"),
        col(maxCol).cast("long").as("_m"))
      .groupBy("_bkt", "_v")
      .agg(max(col("_m")).as("_vmax"))
      .withColumn("_lpfx", max(col("_vmax")).over(wLocal))
    cand
      .withColumn("_v", col(minCol).cast("long"))
      .join(values, Seq("_bkt", "_v"))
      .withColumn("_spfx",
        when(col("_pfx").isNull, col("_lpfx"))
          .when(col("_lpfx").isNull, col("_pfx"))
          .otherwise(greatest(col("_pfx"), col("_lpfx"))))
      .filter(col(maxCol).cast("long") === col("_vmax") &&
        (col("_spfx").isNull || col(maxCol).cast("long") > col("_spfx")))
      .drop("_bkt", "_v", "_pfx", "_vmax", "_lpfx", "_spfx", "_lo", "_hi")
  }
}
