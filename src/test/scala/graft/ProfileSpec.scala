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
}
