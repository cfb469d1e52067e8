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

  test("exact-moment skew/kurtosis matches a sequential reference; " +
      "constant groups null out; symmetry gives zero skew") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // asymmetric group 1, symmetric group 2, constant group 3
    val rows = Seq[(Long, Long)]((1, 1), (1, 1), (1, 2), (1, 10),
      (2, -4), (2, 0), (2, 4), (3, 5), (3, 5), (3, 5))
    val got = Profile.skewKurtExact(rows.toDF("g", "v"), "g", col("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getDouble(2),
          r.getDouble(3))))).toMap
    def ref(vs: Seq[Double]): (Double, Double) = {
      val n = vs.size.toDouble
      val mean = vs.sum / n
      val m2 = vs.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = vs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = vs.map(x => math.pow(x - mean, 4)).sum / n
      (m3 / (m2 * math.sqrt(m2)), m4 / (m2 * m2) - 3.0)
    }
    val (s1, k1) = ref(Seq(1, 1, 2, 10))
    val (gs1, gk1) = got(1L).get
    assert(math.abs(gs1 - s1) < 1e-9 && math.abs(gk1 - k1) < 1e-9)
    assert(s1 > 0, "right-tailed group must have positive skew")
    val (gs2, _) = got(2L).get
    assert(math.abs(gs2) < 1e-12, "symmetric group must have zero skew")
    assert(got(3L).isEmpty, "zero-variance group must null out")
  }
}
