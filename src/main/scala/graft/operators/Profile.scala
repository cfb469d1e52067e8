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

  /** Candidate-key discovery — the schema-inference pass a curation
    * pipeline runs on an unfamiliar table: per column (and optional
    * column pairs), exact distinct count vs non-null row count, a
    * uniqueness ratio in exact ppm, and the is_key verdict (unique AND
    * total — no nulls). Same one-scan discipline as [[numeric]]: all
    * the COUNT(DISTINCT)s plan into a single Expand + two-phase
    * aggregate. Composite candidates are expressed as struct columns,
    * so pairs cost nothing extra in plan shape. */
  def candidateKeys(df: DataFrame, cols: Seq[String],
      pairs: Seq[(String, String)] = Nil): DataFrame = {
    require(cols.nonEmpty)
    val singles = cols.map { c =>
      (c, col(c), col(c).isNull)
    }
    val composites = pairs.map { case (a, b) =>
      (s"$a,$b", struct(col(a), col(b)),
        col(a).isNull || col(b).isNull)
    }
    val entries = (singles ++ composites).map { case (name, e, isNull) =>
      struct(
        lit(name).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(e).as("n_distinct"))
    }
    df.agg(array(entries: _*).as("p"))
      .select(explode(col("p")).as("e"))
      .select(col("e.col_name"), col("e.n_rows"), col("e.n_nulls"),
        col("e.n_distinct"),
        // all-null column → null ratio (no non-null rows to be unique
        // over), never a division error; empty table → is_key false,
        // not vacuously true
        when(col("e.n_rows") - col("e.n_nulls") > 0L,
          expr("e.n_distinct * 1000000L DIV (e.n_rows - e.n_nulls)"))
          .as("uniqueness_ppm"),
        (col("e.n_rows") > 0L &&
          col("e.n_distinct") === col("e.n_rows") - col("e.n_nulls") &&
          col("e.n_nulls") === 0L).as("is_key"))
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

  /** Per-group population skewness (g1) and excess kurtosis (g2) from
    * EXACT integer power sums — the [[corrRegrExact]] discipline: the
    * only float steps are one nearest-double cast per exact sum and an
    * identically shaped final polynomial, so the doubles are bit-equal
    * across engines and parallelism. (Native skewness()/kurtosis()
    * accumulate doubles in partition order and differ by engine in the
    * bias correction — DuckDB ships the SAMPLE versions.)
    *
    * S3/S4 accumulate in DECIMAL(38,0) (cents⁴ overflows BIGINT);
    * the oracle mirrors them in HUGEINT. One map-side-combined
    * aggregate; the shuffle carries 5 numbers per group.
    */
  def skewKurtExact(df: DataFrame, group: String,
      v: org.apache.spark.sql.Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(col(group), v.cast("long").as("v"))
      .groupBy(group)
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"), // ≤ n·(1e6)² — fits BIGINT
        sum(col("v").cast(d38) * col("v") * col("v")).as("s3"),
        sum((col("v").cast(d38) * col("v")) *
          (col("v").cast(d38) * col("v"))).as("s4"))
      // the float staging below must stay textually identical to the
      // oracle SQL: same names, same association, same literals
      .selectExpr("*", "CAST(n AS DOUBLE) AS nd",
        "CAST(s1 AS DOUBLE) AS d1", "CAST(s2 AS DOUBLE) AS d2",
        "CAST(s3 AS DOUBLE) AS d3", "CAST(s4 AS DOUBLE) AS d4")
      .selectExpr("*", "d1 / nd AS mean", "d2 / nd AS a2",
        "d3 / nd AS a3", "d4 / nd AS a4")
      .selectExpr("*", "a2 - mean * mean AS m2",
        "a3 - 3e0 * mean * a2 + 2e0 * mean * mean * mean AS m3",
        "a4 - 4e0 * mean * a3 + 6e0 * mean * mean * a2" +
          " - 3e0 * mean * mean * mean * mean AS m4")
      .selectExpr(group, "n",
        "CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END AS skew",
        "CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3e0 END AS kurt")
  }
}
