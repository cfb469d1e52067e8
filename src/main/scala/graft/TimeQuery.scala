package graft

/** Minimal same-day A/B timer: run one declared query N times against
  * a corpus and print per-rep wall seconds (first rep includes scan
  * warm-up; compare min-of-reps across code variants, same session
  * shape as Bench). Dev tooling only.
  *
  * Usage: TimeQuery <sfDir> <queryName> [reps] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Engine.session()
    graft.sources.Tables.register(spark, sfDir)
    graft.plans.AsOfJoin.register(spark)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time-query] $name rep=$r rows=$n sec=$sec%.2f")
    }
    spark.stop()
    sys.exit(0)
  }
}
