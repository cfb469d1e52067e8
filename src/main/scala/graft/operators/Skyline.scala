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
  *     is provably dominated and dropped where it sits. Bucket stats
  *     (max + count) are a B-row frame (B ≤ `buckets`), collected to
  *     the driver — the one bounded driver action — where the running
  *     prefix max is computed and rebroadcast as a literal relation.
  *  2. **Exact pass, shape chosen by MEASURED skew.** The bucket
  *     counts give a sound upper bound on surviving candidates: a
  *     pruned row's `maxCol` is strictly below every candidate's in
  *     its own or any later bucket, so only rows in buckets with
  *     `_bmax > _pfx` can survive. When that bound is ≤
  *     `singleSweepMax`, the textbook single-order sweep runs — ONE
  *     window over the global `minCol` order on a set proven small
  *     (the "all data to a single partition" plan is safe exactly
  *     because the partition is provably tiny). Otherwise — the
  *     adversarial regime: an all-frontier corpus where most of the
  *     table survives pruning — the sweep is decomposed so it never
  *     needs a global order: a per-(bucket, value) hash aggregate, a
  *     per-bucket window over the bucket's DISTINCT values, and the
  *     cross-bucket prefix from step 1; even a corpus whose frontier
  *     is the whole table sorts at most one bucket's distinct values
  *     per partition.
  *
  * Soundness of sweeping candidates only (both shapes): if p was
  * pruned then p.max ≤ _pfx(p.bkt) ≤ _pfx(c.bkt) < c.max for every
  * candidate c in p's bucket or later (candidates strictly beat their
  * bucket's prefix), so no pruned row can dominate a candidate.
  *
  * Contract: both criteria columns must be integral (cents/micros the
  * caller scales) — the strict-prefix RANGE frame relies on it.
  */
object Skyline {

  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
      buckets: Int = 1024, singleSweepMax: Long = 100000): DataFrame = {
    val spark = df.sparkSession
    // 1-row bounds collect (bounded driver action, like the B-row
    // stats below): quantization becomes a LITERAL scan-stage
    // expression instead of a broadcast-joined bounds frame — every
    // downstream job loses a scan + broadcast of the bounds subquery
    val Array(bRow) = df.agg(min(col(minCol).cast("long")).as("_lo"),
      max(col(minCol).cast("long")).as("_hi")).collect()
    if (bRow.isNullAt(0)) return df.limit(0) // empty or all-null minCol
    val (lo, hi) = (bRow.getLong(0), bRow.getLong(1))
    val withB = df.withColumn("_bkt",
      if (hi == lo) lit(0L)
      else ((col(minCol).cast("long") - lit(lo)) * buckets /
        lit(hi - lo + 1)).cast("long"))
    // B ≤ `buckets` rows: the bounded driver collect that decides the
    // exact-pass shape AND replaces the former bucket-frame window —
    // the running prefix max is computed here and shipped back as a
    // literal broadcast relation. Null _bkt (null minCol) sorts first,
    // matching the former Window.orderBy("_bkt") null ordering; those
    // rows still feed the running max but never join back (equi-join
    // on null), exactly as before.
    val stats = withB.groupBy("_bkt")
      .agg(max(col(maxCol).cast("long")).as("_bmax"),
        count(lit(1)).as("_bcnt"))
      .collect()
      .map { r =>
        val bkt = if (r.isNullAt(0)) None else Some(r.getLong(0))
        val bmax = if (r.isNullAt(1)) None else Some(r.getLong(1))
        (bkt, bmax, r.getLong(2))
      }
      .sortBy(_._1.getOrElse(Long.MinValue)) // nulls first, then asc
    // running prefix max over strictly-earlier buckets + the candidate
    // upper bound (rows of buckets whose _bmax strictly beats _pfx)
    var running: Option[Long] = None
    var candUpperBound = 0L
    val prefixRows = stats.map { case (bkt, bmax, cnt) =>
      val pfx = running
      if (pfx.isEmpty || bmax.exists(_ > pfx.get)) candUpperBound += cnt
      running = (running, bmax) match {
        case (Some(a), Some(b)) => Some(math.max(a, b))
        case (a, b) => a.orElse(b)
      }
      (bkt, pfx)
    }
    import spark.implicits._
    val prefix = prefixRows
      .collect { case (Some(bkt), pfx) => (bkt, pfx.map(long2Long).orNull) }
      .toSeq.toDF("_bkt", "_pfx")
    val cand = withB.join(broadcast(prefix), Seq("_bkt"))
      .filter(col("_pfx").isNull || col(maxCol).cast("long") > col("_pfx"))
    val swept =
      if (candUpperBound <= singleSweepMax) {
        // measured-small frontier: one-order sweep, but the prefix-max
        // window partitions by BUCKET and combines with the broadcast
        // cross-bucket prefix — the same two-part coverage as the
        // adversarial branch (strictly earlier buckets hold only
        // strictly smaller values; equal values share a bucket), on
        // the undeduplicated rows. A constant partition key is NOT an
        // option: Catalyst strips foldable window partition
        // expressions, so `partitionBy(lit(0))` still plans the
        // empty-spec single-partition window and still logs the
        // unbounded-window warning on every bench tail.
        val wEq = Window.partitionBy("_v")
        val wPrev = Window.partitionBy("_bkt").orderBy("_v")
          .rangeBetween(Window.unboundedPreceding, -1)
        cand
          .withColumn("_v", col(minCol).cast("long"))
          .withColumn("_vmax", max(col(maxCol).cast("long")).over(wEq))
          .withColumn("_lpfx", max(col(maxCol).cast("long")).over(wPrev))
          .withColumn("_spfx",
            when(col("_pfx").isNull, col("_lpfx"))
              .when(col("_lpfx").isNull, col("_pfx"))
              .otherwise(greatest(col("_pfx"), col("_lpfx"))))
      } else {
        // adversarial regime (frontier ~ table): decomposed so no
        // stage has an unpartitioned window over an unbounded set:
        //  a. per-(bucket, minCol-value) max of maxCol — a hash
        //     aggregate, map-side combined, skew-safe;
        //  b. the strict-prefix max over strictly smaller minCol,
        //     split into a within-bucket part (_lpfx: a window
        //     PARTITIONED by bucket over the bucket's DISTINCT minCol
        //     values — heavy duplication collapses in the aggregate
        //     before any sort) and the cross-bucket part (_pfx, from
        //     the driver-computed B-row prefix). A strictly earlier
        //     bucket holds only strictly smaller values (floor
        //     quantization is monotone) and equal values always share
        //     a bucket, so the two parts cover exactly the
        //     strictly-smaller rows — max of the two is the
        //     single-order RANGE-frame result.
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
      }
    swept
      .filter(col(maxCol).cast("long") === col("_vmax") &&
        (col("_spfx").isNull || col(maxCol).cast("long") > col("_spfx")))
      .drop("_bkt", "_v", "_pfx", "_vmax", "_lpfx", "_spfx", "_lo", "_hi")
  }
}
