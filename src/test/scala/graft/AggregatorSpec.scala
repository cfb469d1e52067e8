package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregator
import graft.sources.Tables

class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TopKAggregator returns per-group top-k ids by value") {
    import spark.implicits._
    val data = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0))
      .toDS()
    val topk = new TopKAggregator(2).toColumn
    val r = data
      .groupByKey(_._1)
      .mapValues(x => (x._2, x._3))
      .agg(topk.name("top_ids"))
      .collect().toMap
    assert(r("a") === Seq(2L, 3L)) // 30.0, 20.0
    assert(r("b") === Seq(6L, 5L))
  }

  test("TopKAggregator matches window top-k on real data") {
    import spark.implicits._
    Tables.register(spark, TestSpark.sfDir)
    val orders = spark.table("orders")
      .selectExpr("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)]
    val agg = orders.groupByKey(_._1)
      .mapValues(x => (x._2, x._3))
      .agg(new TopKAggregator(3).toColumn.name("ids"))
      .collect().toMap
    val expect = SparkEntry.queries("window_rank")(spark, TestSpark.sfDir)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (ck, rows) =>
        ck -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    expect.foreach { case (ck, ids) =>
      assert(agg(ck) === ids, s"custkey $ck")
    }
  }
}
