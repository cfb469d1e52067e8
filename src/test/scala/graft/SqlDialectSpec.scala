package graft

import org.scalatest.funsuite.AnyFunSuite

/** MySQL-dialect acceptance on the reference's SPJ parity surface
  * (QueryService.asmx.cs:143-157 parses with TDbVendor.DbVMysql): the
  * translator must rewrite exactly the constructs Spark rejects and
  * leave everything else — including quoted literals that LOOK like
  * those constructs — byte-identical. */
class SqlDialectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir
  import MySqlDialect.translate

  test("LIMIT offset,count rewrites to LIMIT count OFFSET offset") {
    assert(translate("SELECT a FROM t LIMIT 5, 10") ===
      "SELECT a FROM t LIMIT 10 OFFSET 5")
    assert(translate("select a from t limit 0,3") ===
      "select a from t LIMIT 3 OFFSET 0")
    // single-argument LIMIT is untouched
    assert(translate("SELECT a FROM t LIMIT 10") ===
      "SELECT a FROM t LIMIT 10")
    // already-Spark OFFSET form is untouched (idempotence)
    assert(translate("SELECT a FROM t LIMIT 10 OFFSET 5") ===
      "SELECT a FROM t LIMIT 10 OFFSET 5")
  }

  test("quoted literals and identifiers are never rewritten") {
    assert(translate("SELECT 'LIMIT 1, 2' AS s FROM t") ===
      "SELECT 'LIMIT 1, 2' AS s FROM t")
    assert(translate("SELECT \"LIMIT 3, 4\" AS s FROM t") ===
      "SELECT \"LIMIT 3, 4\" AS s FROM t")
    assert(translate("SELECT `LIMIT 5, 6` FROM t") ===
      "SELECT `LIMIT 5, 6` FROM t")
    // escaped quote inside a literal does not end the literal
    assert(translate("SELECT 'it''s LIMIT 1, 2' FROM t LIMIT 1, 2") ===
      "SELECT 'it''s LIMIT 1, 2' FROM t LIMIT 2 OFFSET 1")
    assert(translate("SELECT 'a\\' LIMIT 1, 2' FROM t") ===
      "SELECT 'a\\' LIMIT 1, 2' FROM t")
  }

  test("a column named limit_a is not mistaken for the keyword") {
    assert(translate("SELECT limit_a, b FROM t") ===
      "SELECT limit_a, b FROM t")
  }

  test("MySQL-flavored SPJ parity statement runs end-to-end and " +
      "matches the DataFrame-API result") {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.register(spark, sfDir)
    val engine = new Engine(spark, sfDir)
    val got = engine.getData(MySqlDialect.translate(
      """SELECT `c_custkey`, `c_name`
        |FROM `customer`
        |WHERE `c_nationkey` <> 3 AND `c_mktsegment` = "BUILDING"
        |ORDER BY `c_custkey` LIMIT 2, 4""".stripMargin))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = graft.sources.Tables.load(spark, sfDir, "customer")
      .filter(col("c_nationkey") =!= 3 &&
        col("c_mktsegment") === "BUILDING")
      .orderBy("c_custkey")
      .select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .slice(2, 6)
    assert(got === want)
    assert(got.size === 4)
  }

  test("shared MySQL/Spark constructs pass through: <>, !=, IFNULL, " +
      "NOW comparison, backticks, double-quoted literals") {
    graft.sources.Tables.register(spark, sfDir)
    val engine = new Engine(spark, sfDir)
    // every function/operator here exists in BOTH dialects with the
    // same semantics — the acceptance claim is they need no rewrite
    val df = engine.getData(translate(
      """SELECT `s_suppkey`, IFNULL(`s_name`, "anon") AS nm,
        |  SUBSTRING_INDEX(`s_name`, "#", 1) AS pre
        |FROM `supplier`
        |WHERE `s_acctbal` != 0 AND `s_name` <> ""
        |  AND NOW() > TIMESTAMP "2000-01-01 00:00:00"
        |ORDER BY `s_suppkey` LIMIT 1, 3""".stripMargin))
    assert(df.collect().length === 3)
  }
}
