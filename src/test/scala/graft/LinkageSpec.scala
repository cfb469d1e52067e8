package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Linkage

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("candidates: only same-block pairs, columns prefixed a_/b_") {
    val a = Seq((1L, "x", "b1"), (2L, "y", "b2")).toDF("id", "v", "blk")
    val b = Seq((10L, "x", "b1"), (20L, "z", "b3")).toDF("id", "v", "blk")
    val c = Linkage.candidates(a, b, Seq("blk"), maxPairs = 100L)
    assert(c.columns.sorted.toSeq ===
      Seq("a_id", "a_v", "b_id", "b_v", "blk"))
    val rows = c.select("a_id", "b_id").as[(Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, 10L)))
  }

  test("null block values never match") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("b")))
      .toDF("id", "blk")
    val b = Seq((3L, Option.empty[String]), (4L, Some("b")))
      .toDF("id", "blk")
    val c = Linkage.candidates(a, b, Seq("blk"), 100L)
    assert(c.count() === 1L)
  }

  test("hot blocks drop whole under the pair budget and appear in " +
      "the audit") {
    val a = (1 to 30).map(i => (i.toLong, "hot"))
      .appendedAll(Seq((99L, "cold"))).toDF("id", "blk")
    val b = (1 to 30).map(i => (100 + i.toLong, "hot"))
      .appendedAll(Seq((199L, "cold"))).toDF("id", "blk")
    val c = Linkage.candidates(a, b, Seq("blk"), maxPairs = 100L)
    assert(c.select("blk").distinct().as[String].collect().toSeq ===
      Seq("cold")) // 30*30 = 900 > 100 -> hot dropped whole
    val dropped = Linkage.droppedBlocks(a, b, Seq("blk"), 100L)
      .select("blk", "n_pairs").as[(String, Long)].collect()
    assert(dropped.toSeq === Seq(("hot", 900L)))
  }

  test("the linkage query re-identifies every re-listed part " +
      "(perfect recall of the true mapping at sf0.001)") {
    val links = SparkEntry.queries("record_linkage")(
      spark, TestSpark.sfDir)
    val trueMatches = links
      .filter(col("b_key") === col("a_key") + 5000000L)
    val nParts = graft.sources.Tables
      .load(spark, TestSpark.sfDir, "part").count()
    assert(trueMatches.count() === nParts)
  }
}
