package graft

import org.apache.spark.sql.SparkSession

/** Cross-regime value check at rehearsal scale (dev tooling, not part
  * of the engine): run the graph gate queries once in the BROADCAST
  * regime (the shape the sf10 DuckDB iterative oracle already
  * certified value-identical — `scripts/check_graph_iter.py`, round 9)
  * and once FORCED into the pinned layout with the BFS dense-frontier
  * bitmap rounds engaged (`autoBroadcastJoinThreshold=-1`,
  * `spark.graft.bfs.denseFactor=0`), and require set-identical rows.
  * Transitively: oracle ≡ broadcast output ≡ pinned/dense output, so
  * the at-scale paths this round rebuilt (one-pass pagerank prep +
  * fold-back confinement; typed-bitmap BFS exchange) inherit the
  * oracle's certification at a scale where they actually engage —
  * GraphSpec proves the same equivalence only at toy size.
  *
  * Usage: CrossRegimeCheck <sfDir>   (exit 1 on any mismatch)
  */
object CrossRegimeCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.register(spark, sfDir)

    // MULTISET of rows (row -> count), not a set: the two regimes must
    // agree on duplicate multiplicity too — set equality would pass a
    // regime that doubles or drops duplicate rows undetected
    def rows(name: String): Map[Seq[Any], Int] =
      SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toSeq.map(v => if (v == null) "∅" else v))
        .groupBy(identity).map { case (r, g) => (r, g.length) }

    var failed = false
    for (name <- Seq("graph_pagerank", "graph_bfs")) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val broadcastRows = rows(name)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.bfs.denseFactor", "0")
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val pinnedRows = rows(name)
        val ok = broadcastRows == pinnedRows
        println(s"[cross-regime] $name " +
          s"broadcast=${broadcastRows.valuesIterator.sum} " +
          s"pinned=${pinnedRows.valuesIterator.sum} identical=$ok")
        if (!ok) failed = true
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64 << 20).toString)
        spark.conf.unset("spark.graft.bfs.denseFactor")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
