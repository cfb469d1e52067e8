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

  test("jdbc pushdown: filters and column pruning reach the JDBC scan " +
      "— predicates ship to the site database as WHERE clauses and " +
      "unused columns are never fetched over the wire") {
    val url = JdbcScaffold.ensure(spark, sfDir)
    val df = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "orders_site0").load()
      .filter(col("o_totalprice") > 1000.0 &&
        col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val p = df.queryExecution.executedPlan.toString
    val pl = p.toLowerCase
    // both predicates pushed into the JDBC relation (executed as SQL
    // WHERE by the database, not filtered post-fetch in Spark)
    // (the node's toString elides past ~100 chars, so the EqualTo on
    // o_orderpriority may print truncated as "*Equal..." — its
    // IsNotNull companion proves the column reached the pushdown set)
    assert(pl.contains("pushedfilters: [") &&
      pl.contains("greaterthan(o_totalprice") &&
      pl.contains("isnotnull(o_orderpriority") &&
      pl.contains("*equal"),
      s"filters not pushed to the JDBC scan:\n$p")
    // column pruning: the scan node fetches only the 3 referenced
    // columns — the wide comment/clerk columns never cross the wire
    val scanLine = p.linesIterator
      .find(_.contains("JDBCRelation")).getOrElse("")
    assert(!scanLine.toLowerCase.contains("o_comment") &&
      !scanLine.toLowerCase.contains("o_clerk"),
      s"JDBC scan fetches pruned columns:\n$scanLine")
    // and the pushed plan computes the same rows as the parquet path
    Tables.register(spark, sfDir)
    val want = spark.table("orders")
      .filter(pmod(hash(col("o_orderkey")), lit(4)) === 0 &&
        col("o_totalprice") > 1000.0 &&
        col("o_orderpriority") === "1-URGENT")
      .count()
    assert(df.count() === want && want > 0)
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

  test("MySQL type-mapping matrix: the seam pins the faithful-or-loud " +
      "driver options for TINYINT(1)/YEAR/zero-dates, scoped to mysql " +
      "urls; unsigned-BIGINT-range decimals survive the read path " +
      "value-exact") {
    // The sandbox has no MySQL server; what CAN be pinned without one:
    // (a) the option set the seam hands Connector/J — each entry is
    //     the documented driver contract for a type whose DEFAULT
    //     silently changes meaning (TINYINT(1) 2..127 → true; YEAR →
    //     Jan-1 DATE; '0000-00-00' → scan-aborting exception), and
    val mysql = Tables.jdbcOptions("jdbc:mysql://site1/site1", "orders")
    assert(mysql("tinyInt1isBit") === "false")   // a NUMBER, not a bit
    assert(mysql("yearIsDateType") === "false")  // a NUMBER, not a date
    assert(mysql("zeroDateTimeBehavior") === "convertToNull")
    assert(mysql("url") === "jdbc:mysql://site1/site1" &&
      mysql("dbtable") === "orders")
    // ...scoped to MySQL urls only — other drivers (the Derby
    // scaffold included) reject unknown options loudly
    val derby = Tables.jdbcOptions("jdbc:derby:/tmp/x", "orders")
    assert(!derby.contains("tinyInt1isBit") &&
      !derby.contains("yearIsDateType") &&
      !derby.contains("zeroDateTimeBehavior"))
    // (b) BIGINT UNSIGNED fidelity: Spark's MySQL dialect surfaces it
    //     as DECIMAL(20,0) — prove the seam carries the full 2^64-1
    //     range through a REAL JDBC read without down-casting (Derby
    //     stores DECIMAL(20,0) natively, so the wire shape matches
    //     what Connector/J would hand us)
    val url = JdbcScaffold.ensure(spark, sfDir)
    val stmt = java.sql.DriverManager.getConnection(url)
    try {
      val st = stmt.createStatement()
      try st.execute("DROP TABLE unsigned_probe") catch { case _: Exception => }
      st.execute(
        "CREATE TABLE unsigned_probe (id INT, v DECIMAL(20,0))")
      st.execute("INSERT INTO unsigned_probe VALUES " +
        "(1, 18446744073709551615), (2, 9223372036854775808), (3, 0)")
      st.close()
    } finally stmt.close()
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "unsigned_probe").load()
      .orderBy("ID").collect() // Derby upper-cases unquoted identifiers
    assert(got.map(_.getDecimal(1).toPlainString).toSeq ===
      Seq("18446744073709551615", "9223372036854775808", "0"),
      "unsigned-BIGINT-range values must survive the JDBC read exactly")
    // 2^64-1 and 2^63 are both beyond LongType: the schema must have
    // stayed decimal, not been folded to a long
    assert(got.head.schema("V").dataType ===
      org.apache.spark.sql.types.DecimalType(20, 0))
  }
}
