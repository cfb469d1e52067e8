package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Clustering, Similarity}

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cents: Seq[Seq[Float]] =
    Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))

  // vecs 1,2 point along x (near-identical), 3 along y, 4 along y but
  // rotated enough to stay below the 0.9 pair threshold
  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.01f, 0f, 0f)),
    (2L, Seq(0.99f, 0.0f, 0.01f, 0f)),
    (3L, Seq(0.01f, 1.0f, 0f, 0f)),
    (4L, Seq(0.3f, 0.7f, 0.5f, 0.2f)))
    .toDF("vec_id", "embedding")

  test("assign puts each vector with its directional centroid") {
    val r = Clustering.assign(vecs, cents).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(r.map(_.getInt(1)).toSeq === Seq(0, 0, 1, 1))
    assert(r.forall(_.getLong(2) > 500000L))
  }

  test("zero-norm vector keeps a cluster via the -2 floor") {
    val z = Seq((9L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val r = Clustering.assign(z, cents).collect()
    assert(r.head.getInt(1) === 0 && r.head.getLong(2) === -2000000L)
  }

  test("semantic pairs stay within clusters") {
    val pairs = Clustering.semanticPairs(vecs, cents, threshold = 0.9)
      .collect()
    // only (1,2) — same cluster, near-identical; (3,4) share cluster 1
    // but sit below the threshold; cross-cluster (1,3) is never compared
    assert(pairs.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L)))
    assert(pairs.head.getInt(0) === 0)
    assert(pairs.head.getDouble(3) > 0.9)
  }

  test("per-cluster cap bounds the comparison set") {
    val none = Clustering.semanticPairs(vecs, cents,
      threshold = 0.9, cap = 1).collect()
    assert(none.isEmpty)
  }

  test("decisions: min-id representative, everyone emitted once") {
    val r = Clustering.semanticDecisions(vecs, cents, threshold = 0.9)
      .collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(r.map(_.getBoolean(1)).toSeq ===
      Seq(true, false, true, true))
    assert(r(1).getLong(2) === 1L)
  }

  test("empty centroid model is rejected loudly") {
    intercept[IllegalArgumentException] {
      Clustering.assign(vecs, Seq.empty)
    }
  }

  test("semantic dedup's cluster restriction: measured recall vs the " +
      "global pair set on the real (worst-case unclustered) corpus") {
    import graft.operators.Similarity
    val e = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents8 = Similarity.trainCentroids(e, nCentroids = 8)
    val within = Clustering.semanticPairs(e, cents8, threshold = 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: ALL pairs >= 0.4, any cluster
    import graft.functions.VectorFunctions.cosine_sim
    val a = e.select(col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    val all = a.join(b, col("id_a") < col("id_b"))
      .filter(cosine_sim(col("ea"), col("eb")) >= 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(within.subsetOf(all)) // exact within its scope, never wrong
    val recall = if (all.isEmpty) 1.0
      else (within & all).size.toDouble / all.size
    // SemDeDup's honest trade, MEASURED: near-random 64-d vectors are
    // the worst case for cluster-restricted comparison (a clustered
    // production embedding space keeps similar pairs co-assigned far
    // more often). The floor pins the current corpus/model behavior so
    // a clustering regression is visible; it is NOT a general claim.
    assert(recall >= 0.15, f"within-cluster recall $recall%.2f")
  }

  test("assignment agrees with Similarity.withCluster's argmax") {
    val viaIvf = Similarity.withCluster(vecs, cents)
      .select("vec_id", "cluster_id").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val viaClustering = Clustering.assign(vecs, cents)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(viaIvf === viaClustering)
  }
}
