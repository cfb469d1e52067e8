package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcScaffold, Tables}

/** The JDBC source seam exercised with a REAL embedded database
  * (Derby, on the Spark classpath) — not a mocked reader. Covers the
  * two consumption modes: the `source_jdbc` gate query (fragments
  * reassembled from the site db) and the `spark.graft.jdbc.url`
  * overlay (logical tables transparently resolved via JDBC by
  * Tables.load, with the allowlist keeping lake-native tables on
  * parquet). */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  test("source_jdbc: site-db fragments reassemble to the parquet rollup") {
    val got = SparkEntry.queries("source_jdbc")(spark, sfDir).collect()
    Tables.register(spark, sfDir)
    val want = spark.table("orders")
      .join(spark.table("customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0)
          .as("revenue"))
      .orderBy("c_mktsegment")
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("source_jdbc: site reads are range-partitioned on the key") {
    val df = SparkEntry.queries("source_jdbc")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("JDBCRelation"), s"no JDBC scan in plan:\n$p")
    assert(p.contains("numPartitions=4"),
      s"site read not partitioned:\n$p")
  }

  test("jdbc overlay: allowlisted tables resolve via JDBC, " +
      "the rest stay parquet; results are identical") {
    val url = JdbcScaffold.ensure(spark, sfDir)
    // a sibling session: same SparkContext, isolated conf + catalog —
    // the overlay must not leak into other suites' parquet views
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.jdbc.url", url)
    s2.conf.set("spark.graft.jdbc.tables", "nation,region")
    Tables.register(s2, sfDir)
    val joined = s2.table("nation")
      .join(s2.table("region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
      .orderBy("r_name")
    assert(joined.queryExecution.executedPlan.toString
      .contains("JDBCRelation"), "nation/region should scan via JDBC")
    // customer is NOT allowlisted: must remain a parquet scan
    assert(!s2.table("customer").queryExecution.executedPlan
      .toString.contains("JDBCRelation"))
    Tables.register(spark, sfDir)
    val want = spark.table("nation")
      .join(spark.table("region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
      .orderBy("r_name").collect()
    assert(joined.collect().toSeq == want.toSeq)
  }
}
