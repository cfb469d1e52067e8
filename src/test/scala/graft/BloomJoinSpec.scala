package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tables() = {
    graft.sources.Tables.register(spark, TestSpark.sfDir)
    (spark.table("lineitem"), spark.table("supplier"))
  }

  test("no false negatives: every dim key passes the filter") {
    val (_, supplier) = tables()
    val dim = supplier.filter(col("s_acctbal") > 0)
    val bf = BloomJoin.buildKeyFilter(dim, "s_suppkey", 1024)
    val keys = dim.select("s_suppkey").collect().map(_.getLong(0))
    assert(keys.nonEmpty)
    assert(keys.forall(bf.mightContainLong))
  }

  test("prefiltered join result equals the plain join") {
    val (li, supplier) = tables()
    val dim = supplier.filter(col("s_acctbal") > 6000)
    val got = BloomJoin
      .prefilteredEquiJoin(li, "l_suppkey", dim, "s_suppkey", 1024)
      .select("l_orderkey", "l_linenumber", "s_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val want = li.join(dim, li("l_suppkey") === dim("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("empty dim yields an empty join, not a crash") {
    val (li, supplier) = tables()
    val dim = supplier.filter(col("s_acctbal") > 1e12)
    val r = BloomJoin
      .prefilteredEquiJoin(li, "l_suppkey", dim, "s_suppkey", 1024)
      .count()
    assert(r === 0L)
  }

  test("the filter actually prunes the fact side before the join") {
    val (li, supplier) = tables()
    val dim = supplier.filter(col("s_acctbal") > 6000)
    val bf = BloomJoin.buildKeyFilter(dim, "s_suppkey", 1024)
    val bc = spark.sparkContext.broadcast(bf)
    val kept =
      li.filter(BloomJoin.bloom_might_contain(col("l_suppkey"), bc))
        .count()
    val total = li.count()
    // the dim keeps a small minority of suppliers; with fpp=0.01 the
    // pre-filter must drop well over half the fact rows
    assert(kept < total / 2, s"kept=$kept total=$total")
    assert(kept > 0)
  }

  test("null fact keys are filtered, not crashed") {
    import spark.implicits._
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val dim = Seq(1L).toDF("dk")
    val r = BloomJoin.prefilteredEquiJoin(fact, "k", dim, "dk", 64)
      .collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L))
  }
}
