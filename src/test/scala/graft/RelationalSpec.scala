package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PlanJson
import graft.sources.Tables

/** Reference-parity surface: SPJU operators + fragmentation views
  * (SURVEY.md §2) and the optimizer behaviors the reference hand-rolled
  * (§4.1) falling out of Catalyst. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def init(): Unit = Tables.register(spark, TestSpark.sfDir)

  test("horizontal fragment view reassembles the base table exactly") {
    init()
    val base = spark.table("orders")
    val frag = spark.table("orders_f")
    assert(frag.count() === base.count())
    assert(frag.exceptAll(base).isEmpty && base.exceptAll(frag).isEmpty)
  }

  test("vertical fragment view reassembles all customer rows and columns") {
    init()
    val base = spark.table("customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val frag = spark.table("customer_f")
    assert(frag.exceptAll(base).isEmpty && base.exceptAll(frag).isEmpty)
  }

  test("fragments are disjoint (UNION ALL == UNION DISTINCT here)") {
    init()
    val sites = (0 until 4).map(i => spark.table(s"orders_site$i"))
    val total = sites.map(_.count()).sum
    assert(total === spark.table("orders").count())
  }

  test("selection pushdown reaches the leaf through the fragment union") {
    init()
    val df = spark.sql(
      "SELECT o_orderkey FROM orders_f WHERE o_totalprice > 100000")
    val kinds = PlanJson.opKinds(df.queryExecution.optimizedPlan)
    // every leaf must sit directly under a SEL (filter pushed below UNION)
    val json = PlanJson.optimizedJson(df)
    assert(!kinds.takeWhile(_ != "UNION").contains("SEL"),
      s"filter still above the union: $kinds")
    assert(kinds.count(_ == "LEAF") === 4 && json.contains("o_totalprice"))
  }

  test("column pruning: scan reads only needed columns") {
    init()
    val df = spark.table("lineitem").select("l_orderkey")
    val scanSchema = df.queryExecution.executedPlan.collectLeaves()
      .head.schemaString
    assert(scanSchema.contains("l_orderkey") &&
      !scanSchema.contains("l_returnflag") &&
      !scanSchema.contains("l_extendedprice"))
  }

  test("parquet filter pushdown appears in the physical scan") {
    init()
    val df = spark.table("lineitem").filter(col("l_quantity") > 45)
    val explained = df.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") &&
      explained.contains("l_quantity"))
  }

  test("equi join keeps both sides' columns (reference doJoin shape)") {
    init()
    val c = spark.table("customer")
    val o = spark.table("orders")
    val j = c.join(o, c("c_custkey") === o("o_custkey"))
    assert(j.columns.toSet ===
      (c.columns.toSet ++ o.columns.toSet))
  }

  test("small-dim join broadcasts (nation is always broadcastable)") {
    init()
    val df = spark.table("customer").join(broadcast(spark.table("nation")),
      col("c_nationkey") === col("n_nationkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("Engine.query returns plans, rows, and statistics") {
    val eng = new Engine(spark, TestSpark.sfDir)
    val r = eng.query(
      "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1 ORDER BY 1")
    assert(r.rows.length === 5)
    assert(r.originalPlan.contains("\"OpType\""))
    assert(r.optimizedPlan.contains("LEAF"))
    assert(r.statistics.contains("sizeInBytes"))
    // DOT plan pictures (the reference's JointJS view, engine-side):
    // well-formed digraph, one box per operator, child → parent edges
    val dot = r.optimizedDot
    assert(dot.startsWith("digraph"))
    assert(dot.contains("[label=\"AGG"))
    assert(dot.contains("->"))
    assert(r.originalDot.contains("[label="))
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q21 waiting suppliers equals an independent window derivation") {
    init()
    val got = SparkEntry.queries("q21_waiting_suppliers")(
      spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // independent formulation: per finished order count distinct
    // suppliers and distinct LATE suppliers with one window pass; a
    // line qualifies iff it is late, the order is multi-supplier, and
    // its supplier is the order's only late one.
    val ll = spark.sql(
      """SELECT l.l_orderkey, l.l_suppkey,
        |  CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 75 DAYS
        |       THEN 1 ELSE 0 END AS late
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'F'""".stripMargin)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
    val want = ll
      .withColumn("n_supp",
        size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_late_supp",
        size(collect_set(when(col("late") === 1, col("l_suppkey")))
          .over(w)))
      .filter(col("late") === 1 && col("n_supp") > 1 &&
        col("n_late_supp") === 1)
      .join(spark.table("supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(spark.table("nation"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("executed statistics carry real per-node row counts") {
    val eng = new Engine(spark, TestSpark.sfDir)
    val r = eng.query(
      "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1")
    val (rows, stats) = r.executeWithStats()
    assert(rows.length === 5)
    assert(stats.contains("\"rows\":"))
    // at least one node reports a real (non-negative) runtime row count
    assert("\"rows\":(\\d+)".r.findAllMatchIn(stats)
      .exists(_.group(1).toLong > 0), stats)
  }
}
