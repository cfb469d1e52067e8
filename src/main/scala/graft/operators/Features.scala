package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** ML feature preparation over the corpus — the transform stage
  * between curation and training: the hashing trick (fixed-width
  * sparse text features with no vocabulary build) and equal-frequency
  * discretization with min-max scaling (numeric features). Both are
  * exact-reproducible: the hash is FNV-1a over UTF-8 bytes and the
  * bin cutpoints are exact sort-based percentiles, so an independent
  * engine re-derives every feature value bit-for-bit.
  */
object Features {

  /** Hashing-trick featurizer (Weinberger et al. 2009: feature index
    * = hash mod dim, a second hash bit gives the ±1 sign so collisions
    * cancel in expectation — no vocabulary pass, no driver state).
    * Emits the sparse vector as (doc_id, feat_idx, weight) rows,
    * zero-cancelled entries dropped.
    *
    * Scale shape: hashing happens in the scan stage (codegen'd FNV-1a
    * per token, no vocabulary broadcast or join); the ONE shuffle is
    * the (doc_id, feat_idx) aggregation, map-side combined so at most
    * `dim` rows per document cross the wire. No global state of any
    * kind — a 1000-executor run needs nothing but the corpus scan.
    */
  def hashedTokenFeatures(docs: DataFrame, dim: Int = 256): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), VectorFunctions.fnv1a64(col("tok")).as("h"))
      // pmod = ((h % dim) + dim) % dim on the SIGNED hash; the sign
      // bit is the hash's top bit (h < 0 in two's complement)
      .select(col("doc_id"), pmod(col("h"), lit(dim.toLong)).as("feat_idx"),
        when(col("h") < 0L, -1L).otherwise(1L).as("sgn"))
      .groupBy("doc_id", "feat_idx")
      .agg(sum("sgn").as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** Equal-frequency discretization + global min-max scaling, the
    * boundary-inclusive formulation: bucket(v) = 1 + #{cutpoints c_i
    * < v} with c_i the exact i/buckets percentiles. Ties at a
    * boundary never split across buckets (deterministic, and the
    * property an oracle can re-derive). Null values are excluded.
    * Output: one row per occupied bucket with its row count, value
    * range, and the min-max-scaled range.
    *
    * Scale shape: deliberately NOT ntile() — exact ntile needs a
    * total order (a single-partition window). The cutpoint vector is
    * one bounded aggregate (buckets+1 doubles) broadcast back, bucket
    * assignment is scan-stage arithmetic, and the only shuffle is the
    * `buckets`-group aggregate. Survives any corpus size; the cost of
    * giving up exact equal counts under heavy ties is the documented
    * trade.
    */
  def quantileBins(df: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"))
    val cutCols = (1 until buckets).map(i =>
      expr(s"percentile(v, ${i.toDouble / buckets})").as(s"c$i"))
    val cuts = vals.agg(min(col("v")).as("gmin"),
      (cutCols :+ max(col("v")).as("gmax")): _*)
    val bucketExpr = (1 until buckets)
      .map(i => when(col("v") > col(s"c$i"), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    vals.crossJoin(broadcast(cuts)) // 1-row bounds side
      .select(col("v"), col("gmin"), col("gmax"),
        bucketExpr.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"),
        // identical operands → bit-identical doubles cross-engine
        min((col("v") - col("gmin")) / (col("gmax") - col("gmin")))
          .as("lo_scaled"),
        max((col("v") - col("gmin")) / (col("gmax") - col("gmin")))
          .as("hi_scaled"))
  }
}
