package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Embedded-Derby "site database" scaffold — the reference engine's
  * actual source modality is a relational database per site
  * (`RPC/RPC/RPC.cs:313`: MySQL, connection string `database=site{N}`);
  * this populates a local Derby instance (on the Spark classpath for
  * the Hive metastore) with the same fragment layout the parquet views
  * model — four hash-split horizontal `orders` fragments and the
  * two-way vertical `customer` split — so the JDBC read path can be
  * exercised END TO END: real driver, real SQL pushdown, real
  * partitioned reads, not a mocked seam.
  *
  * The site db is built ONCE per sf dir from the same parquet the
  * oracle reads (content-identical by construction) and memoized via a
  * done-marker; every later call is a path lookup. At 100 TB the
  * analog is the fleet of per-site OLTP databases the lake ingests
  * from — bounded per-site volumes, partitioned JDBC reads keyed on
  * the primary key.
  */
object JdbcScaffold {

  /** Build (once) and return the JDBC url of the site database seeded
    * from `sfDir`'s parquet tables. The memo key hashes the SOURCE
    * CONTENT signature (path + size + mtime of every seeded parquet),
    * not just the path — the driver regenerating the testdata between
    * rounds is a real, recurring event (round 6 died to one), and a
    * path-keyed marker would silently serve the stale database while
    * the oracle reads the fresh parquet. A reaped db directory with a
    * surviving marker also rebuilds. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    // "v2": layout version salt — bump to invalidate dbs seeded by an
    // older scaffold (v1 let Spark's Derby dialect map StringType to
    // CLOB, which Derby cannot compare against pushed string
    // predicates — see writeVarcharStrings)
    val sig = Seq("orders", "customer", "nation", "region")
      .map { t =>
        val f = new java.io.File(s"$sfDir/$t.parquet")
        s"v2:$sfDir/$t:${f.length}:${f.lastModified}"
      }
      .mkString("|")
    val key = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sig) & 0x7fffffff)
    val dbDir = s"/tmp/graft_derby_$key"
    val url = s"jdbc:derby:$dbDir"
    val marker = new java.io.File(s"$dbDir.done")
    if (marker.exists() && new java.io.File(dbDir).isDirectory) return url
    deleteRec(new java.io.File(dbDir))
    val createUrl = s"$url;create=true"
    val props = new java.util.Properties()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // horizontal fragments: same deterministic hash split as the
    // parquet fragment views (Tables.register)
    (0 until 4).foreach { site =>
      writeVarcharStrings(
        orders.filter(pmod(hash(col("o_orderkey")), lit(4)) === site),
        createUrl, s"orders_site$site", props)
    }
    // vertical fragments: name side + account side sharing the key
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    writeVarcharStrings(cust.select("c_custkey", "c_name", "c_mktsegment"),
      createUrl, "customer_v1", props)
    writeVarcharStrings(
      cust.select("c_custkey", "c_acctbal", "c_nationkey"),
      createUrl, "customer_v2", props)
    // whole logical dimension tables, for the `spark.graft.jdbc.url`
    // overlay path (Tables.load routes these via JDBC when the
    // allowlist names them)
    Seq("nation", "region").foreach { t =>
      writeVarcharStrings(spark.read.parquet(s"$sfDir/$t.parquet"),
        createUrl, t, props)
    }
    marker.createNewFile()
    url
  }

  /** Seed a table with every StringType column created as VARCHAR.
    * Spark's Derby dialect defaults StringType to CLOB, and Derby
    * refuses to COMPARE a CLOB against a character literal — so a
    * pushed-down string predicate (`WHERE o_orderpriority =
    * '1-URGENT'`, exactly what filter pushdown ships to the database)
    * fails AT THE SITE DB despite being a perfectly valid plan. A
    * real MySQL site maps strings to comparable TEXT/VARCHAR, so
    * VARCHAR seeding keeps the Derby scaffold faithful to what the
    * seam is standing in for. */
  private def writeVarcharStrings(
      df: org.apache.spark.sql.DataFrame, url: String, table: String,
      props: java.util.Properties): Unit = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(512)").mkString(", ")
    val w = df.coalesce(1).write.mode("overwrite")
    (if (strCols.nonEmpty) w.option("createTableColumnTypes", strCols)
     else w).jdbc(url, table, props)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(): Unit
  }
}
