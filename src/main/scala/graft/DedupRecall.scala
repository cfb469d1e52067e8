package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Dev tool: SimHash hamming distribution over the planted near-dup
  * pairs (ground truth = shared 50-char prefix) → informs band layout. */
object DedupRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val sigs = docs.select(col("doc_id"),
      substring(col("text"), 1, 50).as("pfx"),
      VectorFunctions.simhash64(TextFunctions.tokens(col("text")))
        .as("sig"))
    val a = sigs.as("a")
    val b = sigs.as("b")
    val truth = a.join(b,
        col("a.pfx") === col("b.pfx") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
    truth.groupBy("hamming").count().orderBy("hamming").show(30)
    spark.stop()
  }
}
