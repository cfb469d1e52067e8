package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Checks
import graft.operators.Checks._

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some(10.0), Some("a")),
    (Some(2L), Some(200.0), Some("b")),
    (Some(2L), None, Some("z")), // dup key, null value
    (None, Some(-5.0), None)) // null key, out-of-range, null pred
    .toDF("id", "v", "tag")

  private lazy val ref = Seq("a", "b", "c").toDF("r_tag")

  private def report = Checks.run(df, Seq(
    NotNull("id"),
    InRange("v", 0.0, 100.0),
    Satisfies("tag_short", length(col("tag")) <= 1),
    Unique(Seq("id")),
    ForeignKey("tag", ref, "r_tag")))

  test("every check family counts exact violations") {
    val byName = report.collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getBoolean(3))).toMap
    assert(byName("not_null(id)") === ((4L, 1L, false)))
    // null v and 200.0 and -5.0 violate [0, 100]
    assert(byName("in_range(v,0.0,100.0)") === ((4L, 3L, false)))
    // null tag -> null predicate -> violation; "z"/"a"/"b" pass
    assert(byName("satisfies(tag_short)") === ((4L, 1L, false)))
    // ids (1, 2, 2, null): 4 rows, 3 distinct tuples -> 1 violation
    assert(byName("unique(id)") === ((4L, 1L, false)))
    // non-null tags (a, b, z): z is an orphan
    assert(byName("foreign_key(tag)") === ((4L, 1L, false)))
    assert(byName.size === 5)
  }

  test("a clean table passes every row-level and key check") {
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b"))
      .toDF("id", "v", "tag")
    val r = Checks.run(clean, Seq(
      NotNull("id"), InRange("v", 0.0, 10.0),
      Unique(Seq("id")), ForeignKey("tag", ref, "r_tag")))
      .collect()
    assert(r.forall(_.getBoolean(3)), r.mkString("\n"))
    assert(r.forall(_.getLong(2) === 0L))
  }

  test("all row-level checks share ONE aggregate over one scan") {
    val plan = Checks.run(df, Seq(
      NotNull("id"), InRange("v", 0.0, 100.0),
      Satisfies("p", col("v") > 0)))
      .queryExecution.executedPlan.toString
    // single source scan: no per-check rescans of the input
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) === 1,
      s"input scanned more than once:\n$plan")
  }

  test("streaming gate's final counters equal the batch row-level " +
      "report on the real corpus") {
    val sink = graft.streaming.DocsStream.runChecksStream(
      spark, TestSpark.sfDir, "checks_spec_sink")
    val streamed = spark.table(sink)
      .orderBy("check").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3)))
    val batch = Checks.rowLevelReport(
      graft.sources.Tables.load(spark, TestSpark.sfDir, "documents"),
      Seq(NotNull("text"), InRange("n_chars", 1.0, 500.0),
        Satisfies("n_chars_consistent",
          length(col("text")) === col("n_chars")),
        Satisfies("lang_known",
          col("lang").isin("en", "fr", "es", "de", "zh"))))
      .orderBy("check").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3)))
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.map(_._1).length === 4)
  }

  test("multi-column uniqueness counts duplicate tuples, not values") {
    val d = Seq((1L, "x"), (1L, "y"), (1L, "y"))
      .toDF("k1", "k2")
    val r = Checks.run(d, Seq(Unique(Seq("k1", "k2")))).collect()
    assert(r.head.getLong(2) === 1L) // only (1, y) repeats
  }
}
