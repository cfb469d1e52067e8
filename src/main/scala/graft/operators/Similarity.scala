package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`), part of
  * the LLM-data-pipeline surface (BASELINE.json north star).
  *
  * Two paths, as the brief prescribes:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set against the (huge) corpus; one scan, no corpus shuffle;
  *    per-query top-k via window rank. The baseline and the verifier
  *    for the approximate path.
  *  - [[lshTopK]] — hyperplane-LSH bucketed ANN: corpus is pre-bucketed
  *    by signature bands; a query probes only its matching buckets, so
  *    scan cost drops from |corpus| to the probed fraction. The path
  *    that survives 100 TB (bucketing is a data-layout decision — at
  *    scale the banded table would be written bucketed-by bkey).
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` must be
    * small enough to broadcast (the typical online / eval case);
    * the corpus side never shuffles — cost is one corpus scan. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Approximate top-k via hyperplane LSH: `bits`-bit signatures split
    * into `bands`; query and corpus vectors sharing any band bucket are
    * scored. Recall is tunable via bits/bands (fewer bits per band →
    * more candidates → higher recall, higher cost). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      bits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1

    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        hyperplane_sig(col("embedding"), bits).as("sig"))
        .select(col(idAs), col(embAs),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * bandBits).bitwiseAND(mask)
                .as("bkey"))): _*)).as("bk"))
        .select(col(idAs), col(embAs),
          col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    val c = banded(corpus, "neighbor_id", "c_emb")
    val q = banded(queries, "query_id", "q_emb")

    val scored = c.join(broadcast(q), Seq("band", "bkey"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("q_emb"), col("c_emb")).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
