package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/band joins at scale. Spark plans a pure range predicate
  * (`r.ts BETWEEN l.ts + lower AND l.ts + upper`) as a broadcast
  * nested loop — O(|L|·|R|) work and a full broadcast of one side,
  * which dies long before 100 TB. [[bandJoin]] applies the standard
  * rewrite: quantize time into buckets as wide as the band, explode
  * each left row into the (≤2) buckets its window can touch, and join
  * bucket-equi + residual band filter. The nested loop becomes a hash
  * shuffle join whose cost is rows-in-matching-buckets, and both sides
  * partition by bucket — no broadcast required.
  */
object Ranges {

  /** floorDiv on integral columns, exact for negatives (pmod is always
    * non-negative, unlike %). The `/` is Spark double division — exact
    * here because the numerator is a multiple of w and epoch-micros
    * magnitudes stay far below 2^53 — cast back to long for sequence().
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / w).cast("long")

  /** Inner band join: rows of `right` whose `rightTs` lies in
    * `[leftTs + lowerMicros, leftTs + upperMicros]`. Timestamps are
    * compared at microsecond precision. Each (left, right) match is
    * emitted exactly once — a right row lives in one bucket, so the
    * left-side explode cannot duplicate a pair. Compose outer variants
    * by re-joining the match list to the original left side. */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: Column,
      rightTs: Column,
      lowerMicros: Long,
      upperMicros: Long): DataFrame = {
    require(upperMicros >= lowerMicros, "empty band")
    // collision-free working-column name: withColumn would silently
    // REPLACE a user column named "_bucket" and drop() would then strip
    // the user's data from the output
    val bcol = Iterator.iterate("_bucket")(_ + "_")
      .dropWhile(n => left.columns.contains(n) || right.columns.contains(n))
      .next()
    val w = math.max(upperMicros - lowerMicros, 1L)
    val lo = floorDiv(unix_micros(leftTs) + lowerMicros, w)
    val hi = floorDiv(unix_micros(leftTs) + upperMicros, w)
    val l = left.withColumn(bcol, explode(sequence(lo, hi)))
    val r = right.withColumn(bcol, floorDiv(unix_micros(rightTs), w))
    l.join(r,
        l(bcol) === r(bcol) &&
          unix_micros(rightTs) >= unix_micros(leftTs) + lowerMicros &&
          unix_micros(rightTs) <= unix_micros(leftTs) + upperMicros)
      .drop(bcol)
  }

  /** Interval OVERLAP join: pairs whose [start, end] intervals
    * intersect, optionally scoped by equi-keys (without a scope key
    * every interval overlaps a constant fraction of the corpus and no
    * algorithm saves you — the keys are what make the query sane at
    * scale). Same bucket-quantization rewrite as [[bandJoin]], with
    * the two-sided-explode twist: BOTH sides explode into the buckets
    * their interval touches, so a pair could match in several buckets
    * — it is emitted exactly once, in the bucket containing
    * `greatest(start_l, start_r)` (the overlap's left edge). Bucket
    * width must be ≥ the longest interval so each interval touches ≤2
    * buckets and the explode factor is bounded by 2.
    *
    * Columns must be pre-aliased to avoid collisions; `endL`/`endR`
    * are inclusive microsecond timestamps. */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[(Column, Column)],
      startL: Column, endL: Column,
      startR: Column, endR: Column,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, "bucket width must be positive")
    val bcol = Iterator.iterate("_bucket")(_ + "_")
      .dropWhile(n => left.columns.contains(n) || right.columns.contains(n))
      .next()
    def buckets(s: Column, e: Column) = sequence(
      floorDiv(unix_micros(s), bucketMicros),
      floorDiv(unix_micros(e), bucketMicros))
    val l = left.withColumn(bcol, explode(buckets(startL, endL)))
    val r = right.withColumn(bcol, explode(buckets(startR, endR)))
    val overlap =
      unix_micros(startL) <= unix_micros(endR) &&
        unix_micros(startR) <= unix_micros(endL)
    val once = l(bcol) === floorDiv(
      greatest(unix_micros(startL), unix_micros(startR)), bucketMicros)
    val cond = (keys.map { case (a, b) => a === b } :+
      (l(bcol) === r(bcol)) :+ overlap :+ once).reduce(_ && _)
    l.join(r, cond).drop(l(bcol)).drop(r(bcol))
  }
}
