package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Dev tool: recall@k of the approximate ANN paths vs brute force, per
  * parameter setting — the tuning loop for lshTopK/ivfTopK defaults. */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    Tables.register(spark, sfDir)
    val corpus = spark.table("embeddings")
    val queries = corpus.filter(col("vec_id") % 50 === 0)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val bf = pairs(Similarity.bruteForceTopK(corpus, queries, 10))
    for ((bits, bands) <- Seq((16, 4), (16, 8), (32, 8), (24, 8), (32, 16))) {
      val t0 = System.nanoTime()
      val lsh = pairs(Similarity.lshTopK(corpus, queries, 10, bits, bands))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[lsh bits=$bits bands=$bands] recall=" +
        f"${(bf & lsh).size.toDouble / bf.size}%.2f time=$dt%.2f s")
    }
    // (16, 12) is the DECLARED sim_topk_ivf operating point — keep it
    // in the sweep so every recorded anchor carries its recall
    for ((nc, np) <- Seq((16, 4), (16, 8), (16, 12), (32, 8), (64, 16))) {
      val t0 = System.nanoTime()
      val ivf = pairs(Similarity.ivfTopK(corpus, queries, 10, nc, np))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ivf nc=$nc np=$np] recall=" +
        f"${(bf & ivf).size.toDouble / bf.size}%.2f time=$dt%.2f s")
    }
    spark.stop()
  }
}
