package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BoundedMinCollect.bounded_min_collect

class BoundedCollectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random rows: (group, key) with unique keys per
  // group, spread over many partitions to exercise partial buffers,
  // buffer serialization and the merge path
  private lazy val rows = (0 until 5000).map { i =>
    (i % 7, (i * 2654435761L) % 100000)
  }
  private lazy val df = rows.toDF("g", "k").repartition(13)

  private def expected(max: Int): Map[Int, Seq[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sorted.take(max)
    }

  test("long child: equals collect_list + sort + truncate") {
    for (max <- Seq(1, 10, 317, 100000)) {
      val got = df.groupBy("g")
        .agg(bounded_min_collect(col("k"), max).as("ks"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1))
        .toMap
      assert(got === expected(max), s"max=$max")
    }
  }

  test("struct child: keeps payload of the max smallest first fields") {
    val sdf = df.withColumn("payload", col("k") * 3 + 1)
    val got = sdf.groupBy("g")
      .agg(bounded_min_collect(
        struct(col("k"), col("payload")), 25).as("ps"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getLong(1))))
      .toMap
    val want = expected(25).map { case (g, ks) =>
      g -> ks.map(k => (k, k * 3 + 1))
    }
    assert(got === want)
  }

  test("identical retained set to the generators' sort-truncate cap") {
    // the exact CappedPairs contract: pairs from the bounded bucket
    // must equal pairs from the full bucket under the same cap
    import graft.functions.VectorFunctions.capped_pairs
    val cap = 50
    val bounded = df.groupBy("g")
      .agg(bounded_min_collect(col("k"), cap).as("ids"))
      .select(col("g"), explode(capped_pairs(col("ids"), cap)).as("p"))
      .select("g", "p.id_a", "p.id_b")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val full = df.groupBy("g")
      .agg(collect_list(col("k")).as("ids"))
      .select(col("g"), explode(capped_pairs(col("ids"), cap)).as("p"))
      .select("g", "p.id_a", "p.id_b")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(bounded === full)
    assert(bounded.nonEmpty)
  }

  test("degenerate hot bucket: 500k colliding rows, O(cap) buffers") {
    // the scenario the bounded collect exists for — every row lands in
    // ONE group; collect_list would materialize all 500k in a single
    // aggregation buffer before any downstream cap could truncate
    val hot = spark.range(500000)
      .selectExpr("0 AS g", "id * 7919 % 1000003 AS k")
    val got = hot.groupBy("g")
      .agg(bounded_min_collect(col("k"), 50).as("ks"))
      .collect()(0).getSeq[Long](1)
    // 7919 is invertible mod the prime 1000003, so keys are unique and
    // the retained set is exactly the 50 smallest
    val want = (0L until 500000L).map(_ * 7919 % 1000003)
      .sorted.take(50)
    assert(got === want)
  }

  test("struct child: duplicate leading field breaks ties by the NEXT " +
      "long field, independent of partitioning") {
    // the incremental-LSH asymmetric cap keys on (pri∈{0,1}, doc_id):
    // with the old single-field comparator, which rows survived a
    // capped bucket among same-pri ties was arrival-order-dependent.
    // Now the comparator is lexicographic over the leading long run,
    // so the retained set must be the sort-by-(pri,doc_id) prefix —
    // identically for ANY physical layout.
    val base = (0 until 4000).map { i =>
      (i % 5, (i % 3 == 0).compareTo(false).toLong, // pri 0 or 1
        (i * 48271L) % 99991)
    }
    val want = base.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(30)
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = base.toDF("g", "pri", "doc_id").repartition(parts)
        .groupBy("g")
        .agg(bounded_min_collect(
          struct(col("pri"), col("doc_id")), 30).as("ps"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(p => (p.getLong(0), p.getLong(1))))
        .toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("empty groups and null inputs") {
    val ndf = Seq((0, Some(5L)), (0, None), (1, None))
      .toDF("g", "k")
    val got = ndf.groupBy("g")
      .agg(bounded_min_collect(col("k"), 10).as("ks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got === Map(0 -> Seq(5L), 1 -> Seq.empty))
  }
}
