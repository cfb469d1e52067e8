package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Source-format breadth beyond the reference's MySQL-only connector
  * (SURVEY.md §2.1): parquet (primary), csv, json round-trips. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv round-trip preserves rows and values") {
    Tables.register(spark, TestSpark.sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val orders = spark.table("orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(orders.schema).csv(dir)
    assert(back.count() === orders.count())
    val a = orders.agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    val b = back.agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(a === b)
  }

  test("json round-trip preserves rows and nested access") {
    Tables.register(spark, TestSpark.sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val ev = spark.table("events")
      .select("event_id", "user_id", "event_type", "props")
    ev.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
    assert(back.count() === ev.count())
    val ks = back
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    val expect = ev
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    assert(ks === expect)
  }

  test("streaming exact dedup drops duplicates within the watermark") {
    // LLM-pipeline streaming dedup: duplicate the events stream and
    // dedup by event_id — output must equal the distinct input count.
    val stream = graft.streaming.EventsStream
      .readEventsStream(spark, TestSpark.sfDir)
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("spec_dedup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val got = spark.table("spec_dedup_stream").count()
    Tables.register(spark, TestSpark.sfDir)
    assert(got === spark.table("events").select("event_id")
      .distinct().count())
  }

  test("jdbc seam routes table loads through the JDBC reader when configured") {
    // No database exists in this sandbox; the seam is proved by ROUTING:
    // with the url set, the load must go to the JDBC source (which then
    // fails to find a driver for the bogus url) instead of parquet.
    spark.conf.set("spark.graft.jdbc.url", "jdbc:nosuchdb://nowhere/db")
    try {
      val e = intercept[Exception] {
        Tables.load(spark, TestSpark.sfDir, "nation").collect()
      }
      val msg = (e.getMessage + Option(e.getCause).fold("")(_.getMessage))
        .toLowerCase
      assert(msg.contains("driver") || msg.contains("jdbc"), e.getMessage)
    } finally spark.conf.unset("spark.graft.jdbc.url")
    // and with the url unset, the parquet path still works
    assert(Tables.load(spark, TestSpark.sfDir, "nation").count() === 25)
  }

  test("CSV and JSON round-trips preserve the relation exactly") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("source_csv_json")(spark, TestSpark.sfDir)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    Tables.register(spark, TestSpark.sfDir)
    val want = spark.table("nation")
      .join(spark.table("region"), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    assert(r.toSeq === want.toSeq && r.length === 25)
  }

  test("regenerating a source dir cleans stale orders-fragment roots " +
      "but never a root a live session still reads, nor one inside " +
      "the cross-JVM grace window") {
    import java.io.File
    import java.nio.file.{Files, StandardCopyOption}
    // A private copy of the smallest testdata dir so mtime bumps
    // (simulating the driver's per-round corpus regeneration) don't
    // touch the shared read-only corpus.
    val dir = Files.createTempDirectory("graft_frag_regen").toString
    def copyTree(from: File, to: File): Unit =
      if (from.isDirectory) {
        to.mkdirs()
        Option(from.listFiles()).toSeq.flatten
          .foreach(f => copyTree(f, new File(to, f.getName)))
      } else Files.copy(from.toPath, to.toPath,
        StandardCopyOption.REPLACE_EXISTING)
    Option(new File(TestSpark.sfDir).listFiles()).toSeq.flatten
      .foreach(f => copyTree(f, new File(dir, f.getName)))

    val fragsDir = new File(sys.props("java.io.tmpdir"), "graft_frags")
    val fam = java.lang.Integer.toHexString(
      new File(s"$dir/orders.parquet").getCanonicalPath.hashCode)
    def roots(): Seq[String] =
      Option(fragsDir.listFiles()).toSeq.flatten.map(_.getName)
        .filter(_.startsWith(s"orders_${fam}_")).sorted
    // "Regenerate" the corpus: bump every orders file's mtime so the
    // content signature changes while the data stays valid.
    def bump(f: File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.foreach(bump)
      else assert(f.setLastModified(f.lastModified() + 60000L))

    val prevGrace = sys.props.get("graft.frags.graceMs")
    sys.props("graft.frags.graceMs") = "60000"
    try {
      val s1 = spark.newSession() // held strongly: stays a live reader
      Tables.register(s1, dir)
      val first = roots()
      assert(first.size === 1,
        s"one root after first registration: $first")
      val ordersRows = spark.read.parquet(s"$dir/orders.parquet").count()

      // Plant fake siblings mimicking roots minted by ANOTHER JVM
      // (never in this JVM's live set): one long-dead, one fresh.
      def plant(name: String, ageMs: Long): File = {
        val f = new File(fragsDir, s"orders_${fam}_$name")
        f.mkdirs()
        Files.write(new File(f, "part-0").toPath, Array[Byte](1))
        assert(f.setLastModified(System.currentTimeMillis() - ageMs))
        f
      }
      plant("deadbeef", 120000L) // older than the 60 s grace window
      plant("0fresh00", 0L)      // inside the grace window

      bump(new File(s"$dir/orders.parquet"))
      val s2 = spark.newSession()
      Tables.register(s2, dir)
      val second = roots()
      // s1's root survives (live reader), the fresh foreign sibling
      // survives (grace), the dead foreign sibling is cleaned, and the
      // regeneration minted a new signature.
      assert(!second.contains(s"orders_${fam}_deadbeef"),
        s"dead foreign sibling not cleaned: $second")
      assert(second.contains(s"orders_${fam}_0fresh00"),
        s"fresh foreign sibling deleted inside grace window: $second")
      assert(second.intersect(first) === first,
        s"live session's root was deleted: $second (was $first)")
      assert(second.size === 3, s"expected old+new+fresh: $second")
      // BOTH registrations' views still read end-to-end: the old
      // root was NOT pulled out from under s1 (the round-13 cleanup
      // did exactly that), and s2 reads the new root.
      assert(s1.table("orders_f").count() === ordersRows)
      assert(s2.table("orders_f").count() === ordersRows)
    } finally {
      prevGrace match {
        case Some(v) => sys.props("graft.frags.graceMs") = v
        case None => sys.props.remove("graft.frags.graceMs")
      }
    }
  }

  test("ORC round-trip preserves the relation exactly") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("source_orc")(spark, TestSpark.sfDir)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getDouble(3)))
    Tables.register(spark, TestSpark.sfDir)
    val want = spark.table("supplier")
      .join(spark.table("nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name", "s_acctbal")
      .orderBy("s_suppkey")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getDouble(3)))
    assert(r.nonEmpty && r.toSeq === want.toSeq)
  }
}
