package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-trained bigram language-model scoring — the
  * perplexity-style fluency signal a training-data pipeline uses to
  * rank documents by how typical their word sequences are for the
  * corpus (the KenLM-filter shape: train an n-gram model on the
  * corpus, score every document against it). Extension surface; the
  * reference engine has no text analytics (SURVEY.md §2.7).
  *
  * The model is add-one (Laplace) smoothed bigram conditionals,
  * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V)`, with `c(w1·)` the
  * count of w1 as a bigram PREFIX and `V` the unigram vocabulary
  * size. The document score is the MEAN smoothed conditional in exact
  * floor micros — `(1e6·(c12+1)) DIV (c1+V)` per bigram, summed as
  * longs, divided by the bigram count as one integer `DIV` — rather
  * than the textbook mean negative log: the log is a per-bigram
  * monotone transform, so both orderings separate fluent from
  * degenerate text the same way, and skipping the transcendental
  * keeps every score an IEEE-exact function of integer counts (the
  * repo's determinism contract — same honest trade as
  * [[Search.bm25TopK]]'s rational idf and [[Collocations]]' lift;
  * swap in `ln` if parity with an external perplexity matters more
  * than bit-reproducibility). Higher = more corpus-typical; a doc of
  * corpus-frequent bigrams scores orders of magnitude above one of
  * singletons.
  *
  * Scale design (100 TB corpus):
  *  - counts are two map-side-combined aggregates: bigram instances
  *    (one token-stream scan) and prefix counts DERIVED FROM THE
  *    BIGRAM COUNTS (sum over w2 — the corpus is not rescanned), plus
  *    a 1-row vocabulary size off the unigram stream;
  *  - the scoring join streams the per-doc bigrams against the model
  *    on the bigram key — a plain hash-partitioned equi-join, because
  *    a web-scale LM table does NOT broadcast (that join IS the
  *    honest bottleneck and it shuffles only (doc_id, bigram) pairs);
  *    the vocabulary-sized prefix table broadcasts under normal
  *    budgets and AQE flips it to shuffle past them;
  *  - per-doc reduction is one map-side-combined sum/count; docs with
  *    no bigram (< 2 tokens) come back via a left join with score 0,
  *    never silently dropped.
  */
object LangModel {

  def bigramScore(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"),
      explode(TextFunctions.wordBigrams(col("text"))).as("bigram"))
    val c12 = bg.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
    val prefix = c12
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .groupBy("w1").agg(sum(col("c_ab")).as("c_a"))
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val scored = bg
      .join(c12, "bigram")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(broadcast(prefix), "w1")
      .crossJoin(broadcast(vocab))
      // `DIV`, not `/`: the exact integer floor both engines share
      .withColumn("micros",
        expr("(1000000L * (c_ab + 1)) DIV (c_a + v)"))
    val perDoc = scored.groupBy("doc_id").agg(
      sum(col("micros")).as("sum_micros"),
      count(lit(1)).as("n_bigrams"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_micros"), lit(0L)).as("sum_micros"),
        coalesce(expr("sum_micros DIV n_bigrams"), lit(0L))
          .as("avg_micros"))
      .orderBy("doc_id")
  }
}
