package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1.0), Some(10.0)),
    (Some(1.0), None),
    (Some(3.0), Some(30.0)),
    (None, Some(30.0)))
    .toDF("a", "b")

  test("profile counts rows, nulls, distincts and ranges per column") {
    val r = Profile.numeric(df, Seq("a", "b")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getDouble(5)))
    assert(r.toSeq === Seq(
      ("a", 4L, 1L, 2L, 1.0, 3.0),
      ("b", 4L, 1L, 2L, 10.0, 30.0)))
  }

  test("all columns profile in ONE scan (a single Expand aggregate)") {
    val plan = Profile.numeric(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no expand:\n$plan")
    // one scan of the input: the source appears exactly once
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) === 1,
      s"input scanned more than once:\n$plan")
  }

  test("exact-moment corr/slope agrees with native corr to float " +
      "tolerance, stays in [-1,1], nulls out constant columns") {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.register(spark, TestSpark.sfDir)
    val events = spark.table("events")
    val got = Profile.corrRegrExact(
        events, "event_type", hour(col("ts")), round(col("value") * 1e6))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val native = events
      .select(col("event_type"), hour(col("ts")).cast("double").as("x"),
        round(col("value") * 1e6).cast("double").as("y"))
      .groupBy("event_type").agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, c) =>
      assert(!c.isNaN, s"unexpected null corr for $k")
      assert(math.abs(c) <= 1.0)
      assert(math.abs(c - native(k)) < 1e-9, s"$k: $c vs ${native(k)}")
    }
    // constant x within a group → no variance → null, not NaN/throw
    val const = Profile.corrRegrExact(
        events, "event_type", lit(7L), round(col("value") * 1e6))
      .collect()
    assert(const.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }
}
