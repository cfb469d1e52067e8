package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // quasi-id (zip, age); sensitive diagnosis
  private lazy val df = Seq(
    ("02139", 30, "flu"), ("02139", 30, "cold"), ("02139", 30, "flu"),
    ("02139", 31, "flu"),
    ("94105", 40, "ok"), ("94105", 40, "ok"), ("94105", 40, "ok"))
    .toDF("zip", "age", "diag")

  test("report counts classes, sizes and sensitive diversity exactly") {
    val r = Privacy.kAnonymityReport(df, Seq("zip", "age"),
      col("diag"), k = 3L, l = 2L)
      .orderBy("zip", "age").collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2),
        x.getLong(3), x.getBoolean(4), x.getBoolean(5)))
    assert(r.toSeq === Seq(
      ("02139", 30, 3L, 2L, true, true),
      ("02139", 31, 1L, 1L, false, false),
      // size 3 but every diagnosis identical: k holds, l fails
      ("94105", 40, 3L, 1L, true, false)))
  }

  test("suppression drops exactly the rows of sub-k classes") {
    val kept = Privacy.suppressSmallClasses(df, Seq("zip", "age"), 3L)
    assert(kept.count() === 6L)
    assert(kept.filter(col("age") === 31).count() === 0L)
    // released table is k-anonymous by construction
    val audit = Privacy.kAnonymityReport(kept, Seq("zip", "age"),
      col("diag"), 3L, 1L)
    assert(audit.filter(!col("k_ok")).count() === 0L)
  }
}
