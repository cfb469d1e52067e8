package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Dev diagnostic for sim_topk_lsh's cost structure (NOT part of the
  * driver contract): measures, per corpus, the hyperplane-LSH band
  * bucket occupancy and the resulting candidate-pair count the banded
  * join feeds the cosine scorer — the quantity that moves when the
  * generator's embedding distribution drifts between rounds. Run
  * same-day against two corpora (or read against a recorded point) to
  * attribute wall movement to candidate mass vs box noise.
  *
  * Usage: LshDiag [sfDir] (default $SPARK_GRAFT_SF_DIR or sf0.1)
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (bits, bands) = (16, 8)
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val spark = Engine.session()
    val emb = sources.Tables.load(spark, sfDir, "embeddings")

    def banded(df: org.apache.spark.sql.DataFrame, idAs: String) =
      df.select(col("vec_id").as(idAs),
        hyperplane_sig(col("embedding"), bits).as("sig"))
        .select(col(idAs), explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * bandBits).bitwiseAND(mask)
              .as("bkey"))): _*)).as("bk"))
        .select(col(idAs), col("bk.band").as("band"),
          col("bk.bkey").as("bkey"))

    // the driver queries = SparkEntry.annQueries' fixed batch
    val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)

    val cB = banded(emb, "nid").groupBy("band", "bkey")
      .agg(count(lit(1)).as("nc"))
    val qB = banded(q, "qid").groupBy("band", "bkey")
      .agg(count(lit(1)).as("nq"))
    val j = cB.join(qB, Seq("band", "bkey"))
      .agg(sum(col("nc") * col("nq")).as("cand"),
        max("nc").as("maxBucket"), count(lit(1)).as("nBuckets"))
      .collect()(0)
    println(s"[lshdiag] sfDir=$sfDir corpus=${emb.count()} " +
      s"candidates(join rows)=${j.getLong(0)} " +
      s"maxCorpusBucket=${j.getLong(1)} hitBuckets=${j.getLong(2)}")
    // distinct colliding pairs = the cosine evaluations the
    // canonical-band emission performs (the per-band join count above
    // is what the former score-then-distinct shape evaluated)
    val dp = banded(emb, "nid").join(banded(q, "qid"),
        Seq("band", "bkey"))
      .filter(col("nid") =!= col("qid"))
      .select("qid", "nid").distinct().count()
    println(s"[lshdiag] distinct colliding pairs=$dp")
    // per-band occupancy skew: a drifted (more clustered) embedding
    // distribution concentrates mass in few buckets
    banded(emb, "nid").groupBy("band", "bkey")
      .agg(count(lit(1)).as("n")).groupBy("band")
      .agg(max("n").as("maxN"), expr("percentile(n, 0.5)").as("medN"),
        count(lit(1)).as("buckets"))
      .orderBy("band").collect().foreach(r =>
        println(s"[lshdiag] band=${r.getInt(0)} buckets=${r.getLong(2)} " +
          s"maxN=${r.getLong(0)} medN=${r.getDouble(1)}"))
    spark.stop()
  }
}
