package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("resample fills gaps with zeros and carries sums forward") {
    val events = Seq(
      (ts(0, 10), "click", 2.0),
      (ts(0, 40), "click", 3.0),
      // hours 1 and 2 have no clicks at all
      (ts(3, 5), "click", 7.0),
      (ts(1, 0), "view", 10.0))
      .toDF("ts", "event_type", "value")
    val r = TimeSeries.resampleHourly(events).collect()
      .map(x => (x.getTimestamp(0).toString.take(13), x.getString(1),
        x.getLong(2), x.getLong(3),
        if (x.isNullAt(4)) null else x.getLong(4)))
    // full 4-hour × 2-type grid: 8 cells, no hour missing
    assert(r.length === 8)
    val click = r.filter(_._2 == "click")
    assert(click.map(_._3).toSeq === Seq(2L, 0L, 0L, 1L))
    assert(click.map(_._4).toSeq === Seq(5000000L, 0L, 0L, 7000000L))
    // forward fill: the empty hours carry hour 0's sum
    assert(click.map(_._5).toSeq ===
      Seq(5000000L, 5000000L, 5000000L, 7000000L))
    // view starts at hour 1 → hour 0 has no observation to carry
    val view = r.filter(_._2 == "view")
    assert(view.map(_._5).toSeq === Seq(null, 10000000L, 10000000L,
      10000000L))
  }

  test("a series with no gaps is the plain hourly aggregate") {
    val events = (0 until 3).flatMap(h =>
      Seq((ts(h), "click", 1.0), (ts(h, 30), "click", 1.0)))
      .toDF("ts", "event_type", "value")
    val r = TimeSeries.resampleHourly(events).collect()
    assert(r.length === 3)
    assert(r.forall(_.getLong(2) == 2L))
    assert(r.forall(x => x.getLong(3) == x.getLong(4)))
  }

  test("interpolation: gap hours take the proportional value, edges " +
      "stay null") {
    val events = Seq(
      (ts(0), "gauge", 1.0), // 1_000_000 micros at hour 0
      // hours 1 and 2 empty
      (ts(3), "gauge", 4.0), // 4_000_000 micros at hour 3
      (ts(1), "other", 5.0)) // makes hour-0 a LEADING gap for 'other'
      .toDF("ts", "event_type", "value")
    val r = TimeSeries.interpolateHourly(events).collect()
      .map(x => (x.getString(1), x.getTimestamp(0).toString.take(13),
        if (x.isNullAt(4)) null else x.getLong(4)))
    val gauge = r.filter(_._1 == "gauge").map(_._3).toSeq
    // 1M → 2M → 3M → 4M: exact thirds of the 3-hour span
    assert(gauge === Seq(1000000L, 2000000L, 3000000L, 4000000L))
    val other = r.filter(_._1 == "other").map(_._3).toSeq
    // hour 0 precedes the first observation; hours 2-3 follow the
    // last: no extrapolation on either side
    assert(other === Seq(null, 5000000L, null, null))
  }

  test("interpolation of observed hours is the observation itself, " +
      "including a downward slope") {
    val events = Seq(
      (ts(0), "g", 10.0),
      (ts(2), "g", 4.0)) // falling series: negative delta path
      .toDF("ts", "event_type", "value")
    val r = TimeSeries.interpolateHourly(events).collect()
      .map(x => if (x.isNullAt(4)) null else x.getLong(4)).toSeq
    assert(r === Seq(10000000L, 7000000L, 4000000L))
  }

  test("anomaly flags equal a driver-side exact-integer recompute") {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.register(spark, TestSpark.sfDir)
    val got = TimeSeries.anomaly3Sigma(spark.table("events"))
      .select("event_type", "hour", "s_micros", "is_anomaly")
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    // recompute every flag in BigInt — any silently dropped term in
    // the cross-multiplied inequality (decimal typo, Scala multi-line
    // expression split) breaks this
    val byType = got.toSeq.groupBy(_._1._1)
    assert(byType.nonEmpty)
    byType.foreach { case (_, rows) =>
      val ss = rows.map(_._2._1).map(BigInt(_))
      val n = BigInt(ss.size); val s1 = ss.sum
      val s2 = ss.map(x => x * x).sum
      rows.foreach { case ((_, _), (s, flag)) =>
        val lhs = (n * s - s1).pow(2) * (n - 1)
        val rhs = 9 * n * (n * s2 - s1 * s1)
        assert(flag === (lhs > rhs), s"flag mismatch at s=$s")
      }
    }
    // the corpus actually contains anomalies AND normal hours
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("scd2 runs: intervals chain gaplessly, one open run per user, " +
      "event mass conserved, adjacent runs alternate type") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.sources.Tables.register(spark, TestSpark.sfDir)
    val events = spark.table("events")
    val runs = TimeSeries.scd2EventRuns(events).cache()
    try {
      val chain = Window.partitionBy("user_id")
        .orderBy("valid_from", "first_event_id")
      val chained = runs
        .withColumn("next_from", lead(col("valid_from"), 1).over(chain))
        .withColumn("next_type", lead(col("event_type"), 1).over(chain))
      // valid_to is exactly the next run's start; the open run is last
      assert(chained.filter(
        (col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
          || (col("next_from").isNull && !col("is_current"))).count() === 0L)
      // adjacent runs can't share a type (else they'd be one island)
      assert(chained.filter(col("next_type").isNotNull &&
        col("next_type") === col("event_type")).count() === 0L)
      // exactly one current run per user
      assert(runs.filter(col("is_current")).groupBy("user_id").count()
        .filter(col("count") =!= 1).count() === 0L)
      // run event counts sum back to the user's event count
      val lhs = runs.groupBy("user_id").agg(sum("n_events").as("n"))
      val rhs = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(lhs.join(rhs, Seq("user_id"), "full_outer")
        .filter(lhs("n") =!= rhs("n")).count() === 0L)
    } finally runs.unpersist()
  }

  test("retentionCohorts: day-0 counts the whole cohort, offsets are " +
      "non-negative, and per-offset counts never exceed day 0") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.load(spark, TestSpark.sfDir, "events")
    val r = TimeSeries.retentionCohorts(events)
    assert(r.filter(col("day_offset") < 0).count() === 0L)
    val day0 = r.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("c0"))
    // every user is active on their own first day, so day-0 rows
    // exist for every cohort and later offsets can only shrink
    val cohorts = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("n"))
    assert(day0.join(cohorts, "cohort_day")
      .filter(col("c0") =!= col("n")).count() === 0L)
    assert(r.join(day0, "cohort_day")
      .filter(col("n_users") > col("c0")).count() === 0L)
  }

  test("funnelSteps: stage timestamps are monotone and stalls are null") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.load(spark, TestSpark.sfDir, "events")
    val f = TimeSeries.funnelSteps(events)
    // one row per signed-up user
    assert(f.count() ===
      events.filter(col("event_type") === "signup")
        .select("user_id").distinct().count())
    assert(f.filter(col("first_view_ts") < col("signup_ts"))
      .count() === 0L)
    assert(f.filter(col("first_purchase_ts") < col("first_view_ts"))
      .count() === 0L)
    // a purchase can never be attributed without a view step
    assert(f.filter(col("first_view_ts").isNull &&
      col("first_purchase_ts").isNotNull).count() === 0L)
  }
}
