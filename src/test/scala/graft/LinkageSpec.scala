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

  test("hot blocks truncate deterministically under the pair budget " +
      "(never to zero) and appear in the audit") {
    val a = (1 to 30).map(i => (i.toLong, "hot"))
      .appendedAll(Seq((99L, "cold"))).toDF("id", "blk")
    val b = (1 to 30).map(i => (100 + i.toLong, "hot"))
      .appendedAll(Seq((199L, "cold"))).toDF("id", "blk")
    val c = Linkage.candidates(a, b, Seq("blk"), maxPairs = 100L)
    // 30*30 = 900 > 100 -> each side keeps its first
    // floor(sqrt(100)) = 10 rows by id: exactly 100 pairs survive,
    // ids 1-10 x 101-110 — a nonzero deterministic subset, not a
    // dropped block
    val hot = c.filter(col("blk") === "hot")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(hot === (for {i <- 1L to 10L; j <- 101L to 110L}
      yield (i, j)).toSet)
    assert(c.filter(col("blk") === "cold").count() === 1L)
    val dropped = Linkage.droppedBlocks(a, b, Seq("blk"), 100L)
      .select("blk", "n_pairs").as[(String, Long)].collect()
    assert(dropped.toSeq === Seq(("hot", 900L)))
  }

  test("truncation is layout-independent: same kept set at 1 and 7 " +
      "partitions") {
    val a = (1 to 50).map(i => (i.toLong, s"v$i", "hot"))
      .toDF("id", "v", "blk")
    val b = (1 to 50).map(i => (1000 + i.toLong, s"w$i", "hot"))
      .toDF("id", "v", "blk")
    val one = Linkage.candidates(a.coalesce(1), b.coalesce(1),
        Seq("blk"), maxPairs = 9L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val many = Linkage.candidates(a.repartition(7), b.repartition(7),
        Seq("blk"), maxPairs = 9L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(one === many)
    assert(one === (for {i <- 1L to 3L; j <- 1001L to 1003L}
      yield (i, j)).toSet) // floor(sqrt(9)) = 3 per side
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
