package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the graph_pagerank pipeline at a
  * given SF dir. Not part of the driver contract. */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def t(n: String) = sources.Tables.load(spark, sfDir, n)

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.add(f"job ${j.jobId}: ${(System.nanoTime() -
            starts.getOrDefault(j.jobId, System.nanoTime())) / 1e9}%.2f s")
      })

    def build() = {
      val o = t("orders")
      val li = t("lineitem")
      val pairs = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("c"),
          (col("l_suppkey") * 2 + 1).cast("long").as("sp"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
        .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
      val nodes = t("customer")
        .select((col("c_custkey") * 2).cast("long").as("id"))
        .unionByName(t("supplier")
          .select((col("s_suppkey") * 2 + 1).cast("long").as("id")))
      (nodes, edges)
    }

    val (nodes, edges) = build()
    timed("full pageRank COLD") {
      operators.Graph.pageRank(nodes, edges, iters = 5)
        .write.mode("overwrite").format("noop").save()
    }
    Thread.sleep(500)
    jobs.forEach(s => println("[profile] " + s))
    jobs.clear()

    // warm repeat (fresh lineage, same session)
    val (n2, e2) = build()
    timed("full pageRank WARM") {
      operators.Graph.pageRank(n2, e2, iters = 5)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
