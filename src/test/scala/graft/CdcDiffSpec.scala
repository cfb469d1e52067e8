package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Diff}

class CdcDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")

  test("cdc: upsert, insert, delete, and passthrough in one fold") {
    val log = Seq(
      (2L, 1L, "U", "b2", 21.0), // update existing
      (4L, 2L, "I", "d", 40.0), // insert new key
      (3L, 3L, "D", "x", 0.0), // delete existing
      (9L, 4L, "D", "x", 0.0)) // delete of unknown key: no-op
      .toDF("k", "seq", "op", "name", "bal")
    val r = Cdc.applyChangelog(base, log, "k", "seq", "op")
      .orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2),
        x.getString(3)))
    assert(r.toSeq === Seq(
      (1L, "a", 10.0, "base"),
      (2L, "b2", 21.0, "cdc"),
      (4L, "d", 40.0, "cdc")))
  }

  test("cdc: highest seq wins; D>U>I breaks exact seq ties") {
    val log = Seq(
      (1L, 1L, "U", "old", 1.0),
      (1L, 5L, "U", "new", 2.0), // wins over seq 1
      (2L, 7L, "U", "alive", 3.0),
      (2L, 7L, "D", "x", 0.0)) // same seq: D beats U
      .toDF("k", "seq", "op", "name", "bal")
    val r = Cdc.applyChangelog(base, log, "k", "seq", "op")
      .orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq === Seq((1L, "new"), (3L, "c")))
  }

  test("cdc: replaying the changelog onto its own output is " +
      "idempotent (modulo src)") {
    val log = Seq(
      (2L, 1L, "U", "b2", 21.0), (4L, 2L, "I", "d", 40.0),
      (3L, 3L, "D", "x", 0.0))
      .toDF("k", "seq", "op", "name", "bal")
    val once = Cdc.applyChangelog(base, log, "k", "seq", "op")
      .drop("src")
    val twice = Cdc.applyChangelog(once, log, "k", "seq", "op")
      .drop("src")
    assert(twice.exceptAll(once).count() === 0)
    assert(once.exceptAll(twice).count() === 0)
  }

  test("diff: classifies added/removed/changed, omits unchanged, " +
      "null payloads compare null-safe") {
    val v0 = Seq((1L, Some("a")), (2L, Some("b")),
      (3L, Option.empty[String]), (4L, Some("d")))
      .toDF("k", "name")
    val v1 = Seq((1L, Some("a")), (2L, Some("B")),
      (3L, Option.empty[String]), (5L, Some("e")))
      .toDF("k", "name")
    val r = Diff.byKey(v0, v1, "k").orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    // 1 unchanged, 3 unchanged (null <=> null) -> both omitted
    assert(r.toSeq === Seq(
      (2L, "changed"), (4L, "removed"), (5L, "added")))
  }

  test("diff: before/after structs carry the payloads on each side") {
    val v0 = Seq((1L, "a")).toDF("k", "name")
    val v1 = Seq((2L, "b")).toDF("k", "name")
    val r = Diff.byKey(v0, v1, "k")
      .select(col("k"), col("status"), col("before.name"),
        col("after.name"))
      .orderBy("k").collect()
    assert(r(0).getString(2) === "a" && r(0).isNullAt(3))
    assert(r(1).isNullAt(2) && r(1).getString(3) === "b")
  }
}
