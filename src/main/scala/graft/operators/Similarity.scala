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
  /* Default bits/bands tuned on the driver testdata (AnnRecall): 2-bit
   * × 8-band signatures give recall@10 ≈ 0.97 vs brute force even on
   * near-random embeddings; clustered real embeddings prune far better
   * at the same setting. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      bits: Int = 16,
      bands: Int = 8): DataFrame = {
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

  /** IVF (inverted-file) approximate top-k: the corpus is clustered into
    * `nCentroids` lists; a query scans only its `nProbe` closest lists,
    * so scan cost drops to ~nProbe/nCentroids of the corpus.
    *
    * The centroid "model" is deliberately tiny and deterministic: seeds
    * are the vectors with the smallest xxhash64(vec_id) (a seeded sample)
    * refined by `refineIters` distributed Lloyd steps (assign = argmax
    * cosine vs broadcast centroids; recenter = per-dimension mean via
    * posexplode — both shuffle-light). At 100 TB the assignment pass is
    * one scan and the cluster id becomes a partition/bucket column for
    * the written index. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      refineIters: Int = 1): DataFrame = {
    val spark = corpus.sparkSession

    // --- build the centroid model (k × d floats — driver-safe)
    var centroids: Seq[Seq[Float]] = corpus
      .select(col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy("h")
      .limit(nCentroids)
      .collect()
      .map(_.getSeq[Float](0).toSeq).toSeq

    def withCluster(df: DataFrame, cents: Seq[Seq[Float]]): DataFrame = {
      val centArr = typedLit(cents)
      // coalesce: cosine_sim is null for zero-norm vectors — without a
      // floor they would get a null cluster_id and silently vanish from
      // the index
      val scores = transform(centArr,
        c => coalesce(cosine_sim(col("embedding"), c), lit(-2.0)))
      df.withColumn("_scores", scores)
        .withColumn("cluster_id",
          expr("array_position(_scores, array_max(_scores)) - 1")
            .cast("int"))
        .drop("_scores")
    }

    (0 until refineIters).foreach { _ =>
      val assigned = withCluster(corpus, centroids)
      val means = assigned
        .select(col("cluster_id"), posexplode(col("embedding")))
        .groupBy("cluster_id", "pos")
        .agg(avg(col("col")).as("m"))
        .groupBy("cluster_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("dims"))
        .select(col("cluster_id"),
          expr("transform(dims, d -> CAST(d.m AS FLOAT))").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i)))
    }

    // --- index: corpus with cluster ids (at scale: persisted, bucketed)
    val indexed = withCluster(corpus, centroids)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), col("cluster_id"))

    // --- probe: each query → its nProbe closest clusters
    val centArr = typedLit(centroids)
    val probes = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))
      .withColumn("_scores",
        transform(centArr,
          c => coalesce(cosine_sim(col("q_emb"), c), lit(-2.0))))
      .withColumn("_ranked",
        expr(
          s"""slice(array_sort(
             |  zip_with(_scores, sequence(0, ${centroids.size - 1}),
             |           (s, i) -> struct(-s AS negs, i AS cid))),
             |  1, $nProbe)""".stripMargin))
      .withColumn("cluster_id", explode(expr("transform(_ranked, r -> r.cid)")))
      .drop("_ranked", "_scores")

    val scored = indexed.join(broadcast(probes), Seq("cluster_id"))
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
