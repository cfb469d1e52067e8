package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranges
import graft.sources.Tables

/** bandJoin must equal the naive non-equi join (its whole point is
  * changing the PLAN, not the result) and must not plan a nested loop. */
class RangesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bandJoin equals the naive range-predicate join") {
    val e = Tables.load(spark, TestSpark.sfDir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val su = e.filter(col("event_type") === "signup")
      .select(col("ts").as("s_ts"))

    val band = Ranges.bandJoin(p, su, col("ts"), col("s_ts"),
        -1800L * 1000000L, 0L)
      .select("event_id", "s_ts")
    val naive = p.join(su,
        col("s_ts") >= col("ts") - expr("INTERVAL 30 MINUTES") &&
          col("s_ts") <= col("ts"))
      .select("event_id", "s_ts")

    assert(band.count() === naive.count())
    assert(band.exceptAll(naive).isEmpty && naive.exceptAll(band).isEmpty)
    assert(band.count() > 0)
  }

  test("bandJoin plans a hash join, not a nested loop") {
    val e = Tables.load(spark, TestSpark.sfDir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val su = e.filter(col("event_type") === "signup")
      .select(col("ts").as("s_ts"))
    val plan = Ranges.bandJoin(p, su, col("ts"), col("s_ts"),
      -1800L * 1000000L, 0L).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
  }
}
