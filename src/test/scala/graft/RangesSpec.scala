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

  test("interval overlap join equals brute force and emits each " +
      "pair once, for any bucket width") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic pseudo-random intervals, several per key
    val li = (0 until 60).map { i =>
      val s = (i * 37 % 101).toLong * 1000000L
      (i.toLong, i % 3L, ts(s), ts(s + (i % 7 + 1) * 5000000L))
    }.toDF("l_id", "l_k", "l_s", "l_e")
    val ri = (0 until 60).map { i =>
      val s = (i * 53 % 97).toLong * 1000000L
      (i.toLong, i % 3L, ts(s), ts(s + (i % 5 + 1) * 7000000L))
    }.toDF("r_id", "r_k", "r_s", "r_e")
    val brute = li.join(ri,
        col("l_k") === col("r_k") &&
          unix_micros(col("l_s")) <= unix_micros(col("r_e")) &&
          unix_micros(col("r_s")) <= unix_micros(col("l_e")))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted
    assert(brute.nonEmpty && brute.length === brute.distinct.length)
    for (w <- Seq(1000000L, 35000000L, 500000000L)) {
      val got = Ranges.intervalOverlapJoin(li, ri,
          Seq((col("l_k"), col("r_k"))),
          col("l_s"), col("l_e"), col("r_s"), col("r_e"), w)
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted
      assert(got.toSeq === brute.toSeq, s"width $w diverged")
    }
  }

  private def ts(micros: Long): java.sql.Timestamp =
    new java.sql.Timestamp(micros / 1000L)
}
