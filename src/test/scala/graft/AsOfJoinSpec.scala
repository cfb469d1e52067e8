package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin
import graft.sources.Tables

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sides() = {
    Tables.register(spark, TestSpark.sfDir)
    val e = spark.table("events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    (purchases, signups)
  }

  test("as-of join matches a driver-side brute force") {
    val (p, s) = sides()
    val got = AsOfJoin.join(p, s, p("user_id"), s("s_user"),
      p("ts"), s("s_ts"))
      .select("event_id", "s_ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap

    val purchases = p.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val signups = s.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val expect = purchases.flatMap { case (eid, u, ts) =>
      val cands = signups.filter(x => x._1 == u && !x._2.after(ts))
      if (cands.isEmpty) None
      else Some(eid -> cands.maxBy(_._2.getTime)._2)
    }.toMap

    assert(got.size === expect.size)
    expect.foreach { case (eid, sts) =>
      assert(got(eid) === sts, s"event $eid") }
  }

  test("left-outer as-of keeps unmatched rows with null right side") {
    val (p, s) = sides()
    val outer = AsOfJoin.join(p, s, p("user_id"), s("s_user"),
      p("ts"), s("s_ts"), leftOuter = true)
    assert(outer.count() === p.count())
    val inner = AsOfJoin.join(p, s, p("user_id"), s("s_user"),
      p("ts"), s("s_ts"))
    assert(outer.filter(col("s_user").isNull).count() ===
      p.count() - inner.count())
  }

  test("tolerance bounds the look-back window") {
    val (p, s) = sides()
    val unbounded = AsOfJoin.join(p, s, p("user_id"), s("s_user"),
      p("ts"), s("s_ts")).count()
    val tight = AsOfJoin.join(p, s, p("user_id"), s("s_user"),
      p("ts"), s("s_ts"), toleranceMicros = 60L * 1000000).count()
    assert(tight <= unbounded)
    // a 1-minute look-back on day-spanning data must drop matches
    assert(tight < unbounded)
  }

  test("plan shows the custom exec with exchanges and sorts inserted") {
    val (p, s) = sides()
    val df = AsOfJoin.join(p, s, p("user_id"), s("s_user"),
      p("ts"), s("s_ts"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort"), plan)
  }
}
