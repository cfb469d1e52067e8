package graft

/** Dev tool: prints the formatted physical plan of the given (or all
  * headline) declared queries — the review loop for pushdown/broadcast/
  * codegen checks ("is this the plan you'd want at 100 TB?"). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
