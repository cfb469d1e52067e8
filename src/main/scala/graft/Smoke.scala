package graft

/** Dev/driver smoke entry: runs the flagship `SparkEntry.entry` query on
  * sf0.001 and prints rows + the Engine facade's plan JSONs + stats. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"  $r"))
    val eng = new Engine(spark, "/root/testdata/sf0.001")
    val qr = eng.query(
      """SELECT n_name, count(*) AS n FROM customer_f c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_acctbal > 0 GROUP BY n_name ORDER BY n_name""".stripMargin)
    println("originalPlan=" + qr.originalPlan)
    println("optimizedPlan=" + qr.optimizedPlan)
    println("statistics=" + qr.statistics)
    println("rows=" + qr.rows.length)
    spark.stop()
  }
}
