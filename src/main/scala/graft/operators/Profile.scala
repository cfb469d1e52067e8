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
}
