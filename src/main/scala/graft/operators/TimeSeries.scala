package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the events table: resample onto a
  * fixed hourly grid, with explicit gap semantics — the step between
  * raw event logs and anything windowed/longitudinal (rates, SLOs,
  * training curves). A plain `groupBy(hour)` silently OMITS empty
  * buckets; most downstream math (moving averages, deltas, joins
  * against other series) needs them PRESENT, either zero-filled
  * (count/sum semantics) or forward-filled (last-observation-carried-
  * forward for gauge-like values).
  *
  * Shape: one aggregate for the bounds (1 row), a `sequence()` spine
  * exploded from it (declarative — no driver collect), the distinct
  * key set, and one left join of the real hourly aggregate onto the
  * spine×keys grid. Everything shuffles on (hour, key) only; the
  * forward-fill is a running `last(…, ignoreNulls)` window per key —
  * at 100 TB the grid is tiny compared to the events and the window
  * partitions by series key, so no stage depends on total history
  * size. */
object TimeSeries {

  /** Hourly resample of (ts, event_type, value): every (hour, type)
    * cell of the full time range is present — `n_events`/`sum_micros`
    * zero-filled, `ffill_micros` carrying the last observed hour's sum
    * forward (null until a series' first observation). */
  def resampleHourly(events: DataFrame): DataFrame =
    resampledGrid(events).orderBy("hour", "event_type")

  /** The unsorted grid — shared with [[interpolateHourly]] so the
    * intermediate presentation sort never sits under the
    * interpolation windows. */
  private def resampledGrid(events: DataFrame): DataFrame = {
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("t0"),
      date_trunc("hour", max(col("ts"))).as("t1"))
    val spine = bounds.select(
      explode(sequence(col("t0"), col("t1"), expr("interval 1 hour")))
        .as("hour"))
    val keys = events.select(col("event_type")).distinct()
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1e6).cast("long")).as("sm"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.crossJoin(keys)
      .join(hourly, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("sm"), lit(0L)).as("sum_micros"),
        last(col("sm"), ignoreNulls = true).over(w).as("ffill_micros"))
  }

  /** Hourly resample with LINEAR interpolation across gaps — the gauge
    * semantics forward-fill can't give: an empty hour between two
    * observations takes the proportional value between them
    * (`prev + round((next − prev) · Δt/T)` in exact micros; the single
    * double multiply-divide is IEEE-reproducible), while hours before
    * a series' first or after its last observation stay null (an
    * interpolation has no business extrapolating). Two windows per
    * series key — last-observation-behind and first-observation-ahead,
    * both (value, hour) pairs — on top of [[resampleHourly]]'s grid;
    * same scale shape: everything partitions by series key. */
  def interpolateHourly(events: DataFrame): DataFrame = {
    val grid = resampledGrid(events)
      .withColumn("obs",
        when(col("n_events") > 0, col("sum_micros")))
      .withColumn("obs_h",
        when(col("n_events") > 0, unix_timestamp(col("hour"))))
    val behind = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ahead = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("obs"), ignoreNulls = true).over(behind)
    val ph = last(col("obs_h"), ignoreNulls = true).over(behind)
    val nv = first(col("obs"), ignoreNulls = true).over(ahead)
    val nh = first(col("obs_h"), ignoreNulls = true).over(ahead)
    val h = unix_timestamp(col("hour"))
    val interp = when(col("n_events") > 0, col("sum_micros"))
      .otherwise(when(pv.isNotNull && nv.isNotNull,
        pv + round((nv - pv).cast("double") * (h - ph) / (nh - ph))
          .cast("long")))
    grid.select(col("hour"), col("event_type"),
        col("n_events"), col("sum_micros"),
        interp.as("interp_micros"))
      .orderBy("hour", "event_type")
  }

  /** 3-sigma anomaly flags over the hourly series — with the z-test
    * evaluated ENTIRELY in exact integer arithmetic, which is what
    * makes the flag reproducible across engines: variance of doubles
    * is accumulation-order-dependent (every engine sums partitions in
    * its own order), so instead of comparing `|z| > 3` on floats, the
    * inequality is cross-multiplied into integers —
    *
    *   (n·x − S₁)² · (n−1)  >  9 · n · (n·S₂ − S₁²)
    *
    * over micro-scaled hourly sums (S₁ = Σs, S₂ = Σs², both exact).
    * S₂ and the cross products exceed BIGINT, so they ride DECIMAL(38)
    * (HUGEINT on the oracle side). Per-type stats are |event types|
    * rows — broadcast back to the hourly grid; two key-partitioned
    * aggregations, no window, no collect. */
  def anomaly3Sigma(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(sum(round(col("value") * 1e6).cast("long")).as("s_micros"))
    val d38 = "decimal(38,0)"
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("s_micros")).as("s1"),
        sum(col("s_micros").cast(d38) * col("s_micros").cast(d38))
          .as("s2"))
    val lhs = (col("n").cast(d38) * col("s_micros").cast(d38)
      - col("s1").cast(d38))
    val varNum = (col("n").cast(d38) * col("s2")
      - col("s1").cast(d38) * col("s1").cast(d38))
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("is_anomaly",
        lhs * lhs * (col("n").cast(d38) - 1) >
          lit(9).cast(d38) * col("n").cast(d38) * varNum)
      .select(col("hour"), col("event_type"), col("s_micros"),
        col("is_anomaly"))
  }

  /** SCD2 history build — the dimension-maintenance operator of every
    * warehouse load: collapse each user's event stream into runs of
    * consecutive equal `event_type` and emit one validity interval per
    * run (`valid_from`, `valid_to` = next run's start, `is_current` on
    * the open last run). Gaps-and-islands via the two-row_number trick:
    * `rn(user) - rn(user, type)` is constant exactly within a run, so
    * run detection is two windows and a groupBy on the SAME
    * user-partitioned shuffle — Catalyst reuses one exchange; nothing
    * token- or row-expanding happens anywhere.
    *
    * Determinism: events are ordered by `(ts, event_id)` (event_id is
    * unique, so ties at equal timestamps collapse deterministically),
    * and interval chaining orders runs by `(valid_from,
    * first_event_id)` — two runs of one user can share a `valid_from`
    * when same-timestamp events interleave types, so the unique
    * event id, not the timestamp, is the chain tiebreak. */
  def scd2EventRuns(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val chain = Window.partitionBy("user_id")
      .orderBy(col("valid_from"), col("first_event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("island",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(chain))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "event_type", "valid_from", "valid_to",
        "is_current", "n_events", "first_event_id")
  }

  /** Cohort retention matrix: users grouped by their FIRST activity
    * date, then for each (cohort_day, day_offset) the number of
    * cohort members active that day. Two key-partitioned shuffles
    * (per-user first day, then the distinct activity-day count); the
    * (user, day) de-dup happens before the join, so the final count
    * is a plain `count(*)` — no distinct aggregate over the wide
    * side. The standard product-analytics longitudinal view. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    // days as midnight TIMESTAMPs, not DATEs — the one temporal type
    // that round-trips identically through parquet and both engines
    val firstDay = events.groupBy("user_id")
      .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
    events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .join(firstDay, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel attribution: for each signed-up user, the FIRST
    * view at-or-after signup, then the FIRST purchase at-or-after
    * that view — each step conditioned on the previous one landing,
    * nulls where the funnel stalls. Three per-user aggregations
    * sharing the user_id partitioning; no window over raw events, no
    * cross-step explosion (each stage carries one row per user). */
  def funnelSteps(events: DataFrame): DataFrame = {
    val signup = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
    val view = events.filter(col("event_type") === "view")
      .join(signup, "user_id")
      .filter(col("ts") >= col("signup_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("first_view_ts"))
    val purchase = events.filter(col("event_type") === "purchase")
      .join(view, "user_id")
      .filter(col("ts") >= col("first_view_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("first_purchase_ts"))
    signup
      .join(view, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("first_view_ts"),
        col("first_purchase_ts"))
  }
}
