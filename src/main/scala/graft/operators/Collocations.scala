package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Collocation (phrase) mining over the corpus vocabulary: rank word
  * bigrams by LIFT — `P(ab) / (P(a)·P(b))`, the association measure
  * behind phrase detectors. Lift is PMI without the log: the log is a
  * monotone transform, so the RANKING is identical, and skipping the
  * transcendental keeps every score an IEEE-exact function of integer
  * counts (the repo's determinism contract; an external SQL oracle
  * reproduces scores bit-for-bit). Scores are emitted in rounded
  * micros.
  *
  * Scale design: two count aggregations (bigram instances, unigram
  * instances — both map-side partial), the unigram table joined back
  * to the bigram counts twice (broadcast: a vocabulary is millions of
  * rows at web scale, far under join-build budgets; AQE flips to a
  * shuffle join past that), 1-row corpus totals as a broadcast
  * cross join, and a TakeOrdered top-k. `minCount` prunes the long
  * tail BEFORE the joins — rare bigrams are noise for this statistic
  * anyway. */
object Collocations {

  def topBigramsByLift(docs: DataFrame, k: Int = 20,
      minCount: Long = 5): DataFrame = {
    val toks = docs.select(
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
    val bi = docs.select(
        explode(TextFunctions.wordBigrams(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    val mTotal = docs.select(
        size(TextFunctions.wordBigrams(col("text"))).cast("long").as("m"))
      .agg(sum(col("m")).as("m_bigrams"))
    // lift = (c_ab/M) / ((c_a/N)·(c_b/N)) = c_ab·N·N / (M·c_a·c_b);
    // parenthesization is part of the oracle contract
    val lift = (col("c_ab").cast("double") *
      col("n_tokens").cast("double") * col("n_tokens").cast("double")) /
      (col("m_bigrams").cast("double") * col("c_a").cast("double") *
        col("c_b").cast("double"))
    bi.join(broadcast(uni.select(col("tok").as("w1"),
        col("c").as("c_a"))), "w1")
      .join(broadcast(uni.select(col("tok").as("w2"),
        col("c").as("c_b"))), "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(mTotal))
      .select(col("bigram"), col("c_ab"),
        round(lift * 1e6).cast("long").as("lift_micros"))
      .orderBy(col("lift_micros").desc, col("bigram"))
      .limit(k)
  }
}
