package graft
import org.apache.spark.sql.SparkSession
object LcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,4096]")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.executor.memory", "3g")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = spark.range(1000000).map(_ * 2).filter($"value" % 7 === 0)
      .groupBy(($"value" % 10).as("k")).count().collect().map(_.getLong(1)).sum
    println(s"LCPROBE SUM=$n execs=" +
      spark.sparkContext.getExecutorMemoryStatus.size)
    spark.stop()
  }
}
