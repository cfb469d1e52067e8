package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** Embedding-space clustering and cluster-based (semantic) dedup — the
  * SemDeDup-style pipeline: k-means over the embedding column, then
  * near-dup discovery restricted to within-cluster pairs. Extension
  * surface (the reference engine has no vector ops at all, SURVEY.md
  * §2.7).
  *
  * Scale design (100 TB corpus, billions of vectors):
  *  - the model is trained on ONE bounded driver-side sample
  *    ([[Similarity.trainCentroids]]: 1024 vectors, one Spark job);
  *    assignment is a distributed map over a broadcast centroid array —
  *    no shuffle at all;
  *  - within-cluster pair generation shuffles once on `cluster_id` and
  *    is CAPPED per cluster: members rank by centroid affinity and only
  *    the top `cap` compare pairwise. k is chosen so clusters hold
  *    ~10³–10⁴ members (k grows with n); a cluster blowing past `cap`
  *    means k is too small for the corpus, and the cap keeps one hot
  *    cluster from going quadratic while every healthy cluster is
  *    compared exactly — same hot-bucket discipline as the LSH dedup
  *    family ([[Dedup]]);
  *  - decisions reuse [[Dedup.decisionsFromPairs]] (min-id
  *    representative, one shuffle).
  */
object Clustering {

  /** (vec_id, embedding, cluster_id, score): [[Similarity.withCluster]]
    * — the single shared argmax (zero-norm floor, lowest-cluster-id
    * ties) — with the winning affinity kept. */
  private def assigned(embeddings: DataFrame,
      cents: Seq[Seq[Float]]): DataFrame = {
    // an empty model would silently emit null cluster ids (array_max
    // over an empty scores array) — fail loudly instead; callers train
    // on a non-empty corpus or fall back themselves
    require(cents.nonEmpty, "clustering requires at least one centroid")
    Similarity.withCluster(embeddings, cents, keepScore = true)
      .select("vec_id", "embedding", "cluster_id", "score")
  }

  /** Per-vector cluster assignment: (vec_id, cluster_id,
    * score_micros). The affinity is emitted in rounded micros, not as
    * a raw double: corpus↔centroid cosines are NOT bit-reproducible
    * across engines (a full-precision centroid makes the dot product's
    * accumulation order observable — unlike corpus↔corpus cosines,
    * where float-valued operands make every product exact), so the raw
    * double stays internal (ranking only) per the repo determinism
    * rules. */
  def assign(embeddings: DataFrame,
      cents: Seq[Seq[Float]]): DataFrame =
    assigned(embeddings, cents)
      .select(col("vec_id"), col("cluster_id"),
        round(col("score") * 1e6).cast("long").as("score_micros"))
      .orderBy("vec_id")

  /** Within-cluster near-dup pairs: (cluster_id, id_a, id_b, cosine)
    * for pairs with cosine >= `threshold`, both members inside the
    * per-cluster `cap` (ranked by centroid affinity desc, vec_id). */
  def semanticPairs(embeddings: DataFrame, cents: Seq[Seq[Float]],
      threshold: Double = 0.7, cap: Int = 4096): DataFrame = {
    require(cap >= 1, s"per-cluster cap must be >= 1, got $cap")
    val ranked = assigned(embeddings, cents).withColumn("r",
      row_number().over(Window.partitionBy("cluster_id")
        .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("r") <= cap)
    val a = ranked.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = ranked.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cluster_id"), col("id_a"), col("id_b"),
        cosine_sim(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup keep/dup_of decisions over [[semanticPairs]]: min-id
    * representative per star, every vector emitted exactly once. */
  def semanticDecisions(embeddings: DataFrame, cents: Seq[Seq[Float]],
      threshold: Double = 0.7, cap: Int = 4096): DataFrame = {
    val pairs = semanticPairs(embeddings, cents, threshold, cap)
    Dedup.decisionsFromPairs(
        embeddings.select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("keep"), col("dup_of"))
      .orderBy("vec_id")
  }
}
