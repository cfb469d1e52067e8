package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.sources.Tables

/** Dev probe: simhash band-bucket size distribution and candidate-pair
  * counts per band layout — diagnoses quadratic bucket blowup. */
object SimhashBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    Tables.register(spark, sfDir)
    val sigs = spark.table("documents").select(col("doc_id"),
      VectorFunctions.simhash64(TextFunctions.tokens(col("text")))
        .as("sig"))
    for (bands <- Seq(4, 8)) {
      val bits = 64 / bands
      val mask = (1L << bits) - 1
      val b = sigs.select(col("doc_id"),
        explode(array((0 until bands).map(i =>
          struct(lit(i).as("band"),
            shiftright(col("sig"), i * bits).bitwiseAND(mask)
              .as("bkey"))): _*)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val sizes = b.groupBy("band", "bkey").count()
      val pairs = sizes.select(
        sum(col("count") * (col("count") - 1) / 2).as("pairs"),
        max("count").as("max_bucket"))
        .collect()(0)
      println(s"[bands=$bands] candidate-pairs=${pairs.get(0)} " +
        s"max-bucket=${pairs.get(1)}")
    }
    spark.stop()
  }
}
