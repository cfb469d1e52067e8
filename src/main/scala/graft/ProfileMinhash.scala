package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev profiling: times each stage of the MinHash-LSH pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    time("shingles-explode") {
      docs.select(col("doc_id"),
        explode(graft.functions.VectorFunctions
          .shingle_hashes(col("text"), 3))
          .as("sh")).write.mode("overwrite").format("noop").save()
    }
    time("signatures") {
      Dedup.minhashSignatures(docs, 3, 32)
        .write.mode("overwrite").format("noop").save()
    }
    time("full-pipeline") {
      Dedup.minhashLsh(docs)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
