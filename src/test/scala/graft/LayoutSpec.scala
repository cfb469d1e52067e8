package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Layout, Skew, Tables}

/** Scale-layout behaviors: bucketed co-located joins (no shuffle),
  * partition pruning, salted aggregation equivalence. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def init(): Unit = Tables.register(spark, TestSpark.sfDir)

  test("bucketed tables join and aggregate with no shuffle exchange") {
    init()
    Layout.writeBucketed(spark.table("orders"), "orders_b", "o_custkey", 8)
    Layout.writeBucketed(spark.table("customer")
      .withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
      "o_custkey", 8)
    val noBroadcast = "-1"
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", noBroadcast)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"), Seq("o_custkey"))
      assert(!Layout.hasShuffle(j), "co-located join should not shuffle:\n" +
        j.queryExecution.executedPlan.toString)
      val unbucketed = spark.table("orders")
        .join(spark.table("customer")
          .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      assert(Layout.hasShuffle(unbucketed),
        "control: unbucketed join must shuffle")
      // bucketed aggregation on the bucket key: also shuffle-free
      val agg = spark.table("orders_b").groupBy("o_custkey").count()
      assert(!Layout.hasShuffle(agg))
      // results identical to the unbucketed path
      assert(j.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("partitioned table prunes partitions at plan time") {
    init()
    Layout.writePartitioned(
      spark.table("orders").withColumn("o_year", year(col("o_orderdate"))),
      "orders_p", "o_year")
    val pruned = spark.table("orders_p").filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"))
    // partition count read should be 1 year's worth, not all
    val all = spark.table("orders_p")
    assert(pruned.count() < all.count() && pruned.count() > 0)
    // correctness vs unpartitioned filter
    val expect = spark.table("orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() === expect)
  }

  test("z-order files prune on BOTH dimensions; linear sort only one") {
    init()
    import graft.sources.ZOrder
    val li = spark.table("lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val Array(alo, ahi, blo, bhi) = li.agg(
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val nFiles = 16
    val zPath = "/tmp/graft-spec-zorder"
    val linPath = "/tmp/graft-spec-linear"
    ZOrder.writeZOrdered(li, zPath,
      ZOrder.zValue(col("l_partkey"), lit(alo), lit(ahi),
        col("l_suppkey"), lit(blo), lit(bhi), 8), nFiles)
    // control: perfectly sorted on partkey alone
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linPath)
    val zStats = ZOrder.fileStats(spark, zPath, "l_partkey", "l_suppkey")
      .cache()
    val lStats = ZOrder.fileStats(spark, linPath, "l_partkey", "l_suppkey")
      .cache()
    // a ~5%-wide predicate in the middle of each domain
    def mid(lo: Long, hi: Long): (Long, Long) = {
      val w = math.max(1L, (hi - lo + 1) / 20)
      val c = lo + (hi - lo) / 2
      (c, c + w - 1)
    }
    val (plo, phi) = mid(alo, ahi)
    val (slo, shi) = mid(blo, bhi)
    val zPart = ZOrder.overlappingFiles(zStats, "a_min", "a_max", plo, phi)
    val zSupp = ZOrder.overlappingFiles(zStats, "b_min", "b_max", slo, shi)
    val lPart = ZOrder.overlappingFiles(lStats, "a_min", "a_max", plo, phi)
    val lSupp = ZOrder.overlappingFiles(lStats, "b_min", "b_max", slo, shi)
    // linear layout: perfect on its sort column, useless on the other
    assert(lPart <= 3, s"linear partkey pruning: $lPart")
    assert(lSupp === nFiles.toLong,
      s"linear layout should NOT prune on suppkey: $lSupp")
    // z-order: real pruning on BOTH dimensions
    assert(zPart < nFiles, s"z partkey files: $zPart")
    assert(zSupp < nFiles, s"z suppkey files: $zSupp")
    assert(zSupp < lSupp, "z-order must beat linear on the off-sort dim")
    // and the data survives the round trip
    assert(spark.read.parquet(zPath).count() === li.count())
    zStats.unpersist(); lStats.unpersist()
  }

  test("salted aggregation equals direct aggregation") {
    init()
    val direct = spark.table("orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0)
          .as("total"))
    val salted = Skew.saltedCountSum(
      spark.table("orders"), "o_custkey", "o_totalprice")
    assert(salted.exceptAll(direct).isEmpty &&
      direct.exceptAll(salted).isEmpty)
  }

  test("salted equi-join equals the plain join") {
    init()
    val li = spark.table("lineitem")
    val sup = spark.table("supplier")
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey")
    val salted = Skew.saltedEquiJoin(li, "l_suppkey", sup, "s_suppkey",
        xxhash64(col("l_orderkey"), col("l_linenumber")), saltFactor = 4)
      .select("l_orderkey", "l_linenumber", "s_suppkey")
    assert(salted.exceptAll(plain).isEmpty &&
      plain.exceptAll(salted).isEmpty)
    assert(plain.count() > 0 && salted.count() === plain.count())
  }

  test("compact shrinks the file count, sizes from measured bytes, " +
      "and is invisible to readers") {
    Tables.register(spark, TestSpark.sfDir)
    val base = s"/tmp/graft-compact-spec-${java.util.UUID.randomUUID()}"
    val orders = spark.table("orders")
    orders.repartition(32).write.mode("overwrite").parquet(s"$base/frag")
    def files(d: String) = Option(new java.io.File(d).listFiles())
      .toSeq.flatten.filter(f => f.getName.endsWith(".parquet"))
    val before = files(s"$base/frag")
    val out = Layout.compact(spark, s"$base/frag", s"$base/out",
      targetBytes = before.map(_.length()).sum) // everything fits one
    val after = files(out)
    assert(before.size === 32 && after.size === 1)
    val a = spark.read.parquet(out)
    assert(a.exceptAll(orders).isEmpty && orders.exceptAll(a).isEmpty)
    // a tighter target yields proportionally more files
    val out2 = Layout.compact(spark, s"$base/frag", s"$base/out2",
      targetBytes = math.max(1L, before.map(_.length()).sum / 4))
    assert(files(out2).size === 4)
  }
}
