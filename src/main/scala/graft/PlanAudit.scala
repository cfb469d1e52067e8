package graft

/** Fleet-wide physical-plan audit: build every declared query against
  * a corpus and grep its executed plan for the degenerate shapes that
  * kill 100 TB runs — Cartesian products, broadcast nested-loop joins,
  * single-partition exchanges (a global sort/window funneling all data
  * through one task), and sort-based aggregation where hash aggregation
  * was expected. PlanQualitySpec pins ~20 high-value queries in CI;
  * this sweeps ALL of them for review, printing one line per flagged
  * query plus a summary. A flag is a REVIEW ITEM, not automatically a
  * bug: tiny final frames legitimately coalesce to one partition, and
  * some aggregates (median over collected lists) are sort-based by
  * design — the point is that every flag has a reviewed justification.
  *
  * Usage: PlanAudit <sfDir> [namePrefixFilter] */
object PlanAudit {

  private val patterns: Seq[(String, String)] = Seq(
    "cartesian" -> "CartesianProduct",
    "bnl_join" -> "BroadcastNestedLoopJoin",
    "single_part_exchange" -> "Exchange SinglePartition",
    "sort_agg" -> "SortAggregate")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefix = if (args.length > 1) args(1) else ""
    val spark = Engine.session()
    graft.sources.Tables.register(spark, sfDir)
    graft.plans.AsOfJoin.register(spark)

    var flagged = 0
    var failed = 0
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith(prefix))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val hits = patterns.filter { case (_, pat) => plan.contains(pat) }
        if (hits.nonEmpty) {
          flagged += 1
          val lines = hits.map { case (tag, pat) =>
            val l = plan.linesIterator.find(_.contains(pat))
              .getOrElse("").trim.take(100)
            s"$tag[$l]"
          }
          println(s"[plan-audit] $name: ${lines.mkString(" ")}")
        }
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"[plan-audit] $name BUILD FAILED: " +
            s"${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    println(s"[plan-audit] done: ${names.length} queries, " +
      s"$flagged flagged, $failed failed")
    spark.stop()
    sys.exit(if (failed > 0) 1 else 0)
  }
}
