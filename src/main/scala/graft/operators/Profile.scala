package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the "data card" pass a training pipeline runs
  * before anything else: per-column row/null/distinct counts and value
  * ranges. ONE aggregation job for all columns (Catalyst plans the
  * multiple exact COUNT(DISTINCT)s as a single Expand + two-phase
  * aggregate — one scan of the data, not one scan per column), then an
  * explode to long format. At 100 TB: the scan dominates and is paid
  * once; swap `countDistinct` for `approx_count_distinct` when ±2 % is
  * acceptable and the expand factor hurts. */
object Profile {

  /** Long-format numeric profile: one row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val). */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_val"),
        max(col(c)).cast("double").as("max_val"))
    }
    df.agg(array(entries: _*).as("p"))
      .select(explode(col("p")).as("e"))
      .select("e.*")
      .orderBy("col_name")
  }

  /** Per-group Pearson correlation + OLS slope with the moment sums
    * accumulated as EXACT integers — the engine-reproducibility trick
    * the anomaly detector uses, applied to second-order statistics.
    * Spark's `corr`/`regr_slope` (and every other engine's) accumulate
    * doubles in partition order, so two engines — or two RUNS over
    * different partitionings — disagree in the last ulps and can never
    * hash-match; here Σx, Σy, Σx², Σy², Σxy ride BIGINT/DECIMAL(38)
    * exactly, and the only float steps are one cast per exact integer
    * (nearest-double is deterministic) and the identically shaped
    * final division — bit-equal everywhere, at any parallelism.
    *
    * `x` and `y` must already be integer-scaled (micros etc.). Groups
    * where x or y is constant yield null corr/slope (no variance to
    * correlate). One partial-agg shuffle of |groups| rows. */
  def corrRegrExact(df: DataFrame, group: String,
      x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = df
      .select(col(group), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy(group)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
        sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"),
        sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"))
    val num = (agg("n").cast(d38) * col("sxy")
      - agg("sx").cast(d38) * agg("sy").cast(d38))
    val denx = (agg("n").cast(d38) * col("sxx")
      - agg("sx").cast(d38) * agg("sx").cast(d38))
    val deny = (agg("n").cast(d38) * col("syy")
      - agg("sy").cast(d38) * agg("sy").cast(d38))
    agg.select(col(group), col("n"),
      when(denx > 0 && deny > 0,
        num.cast("double")
          / sqrt(denx.cast("double") * deny.cast("double")))
        .as("corr"),
      when(denx > 0, num.cast("double") / denx.cast("double"))
        .as("slope"))
  }
}
