package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Inverted-index keyword search with BM25 ranking — the retrieval
  * primitive a corpus pipeline needs for spot-checking, eval-set
  * mining and nearest-query debugging. Extension surface (the
  * reference engine has no text retrieval, SURVEY.md §2.7).
  *
  * Scoring: BM25's term-frequency saturation exactly —
  * `tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` — with the RATIONAL
  * Robertson idf `(N − df + 0.5)/(df + 0.5)`, i.e. the standard idf
  * without the log. Two reasons, one honest trade:
  *  - every operation stays IEEE-exact-reproducible (+,·,/ on doubles
  *    derived from exact integers), so the external SQL oracle
  *    re-derives scores bit-for-bit — a transcendental ln() is not
  *    portable across engines at the ulp level;
  *  - per-term scores are emitted in rounded micros and SUMMED AS
  *    LONGS, so the cross-term addition order (a shuffle artifact)
  *    cannot perturb the ranking.
  * The trade: without the log, rare terms weigh more heavily relative
  * to common ones than textbook BM25 — fine for corpus tooling; swap
  * the idf expression for the log form if parity with an external
  * BM25 implementation matters more than bit-reproducibility.
  *
  * Scale design (100 TB corpus):
  *  - tokens are filtered to the query's terms IN THE SCAN STAGE
  *    (`tok isin terms` — bounded by query size, not data), so the
  *    only full-width shuffle is the per-(doc, term) tf aggregation
  *    over matching tokens;
  *  - df and the corpus stats (N, total length) are post-aggregation
  *    frames of ≤ |terms| and 1 row — broadcast by construction;
  *  - the final top-k is a TakeOrderedAndProject (per-partition heaps,
  *    no global sort).
  */
object Search {

  /** The per-term BM25 score in exact micros over columns
    * (tf, dl, avgdl, n_docs, df) — factored so the live-scan path and
    * the persisted-index path evaluate the IDENTICAL parenthesization
    * (the oracle repeats it verbatim; every intermediate double must
    * match bit-for-bit on both paths). */
  private def termMicros(k1: Double, b: Double)
      : org.apache.spark.sql.Column = {
    val idf = (col("n_docs").cast("double") - col("df").cast("double")
      + 0.5) / (col("df").cast("double") + 0.5)
    val dlNorm = lit(1 - b) +
      lit(b) * col("dl").cast("double") / col("avgdl")
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1)) /
      (col("tf").cast("double") + lit(k1) * dlNorm)
    round(idf * tfNorm * 1e6).cast("long")
  }

  /** Global rank over a PROVEN-bounded frame (post-limit top-k),
    * without a window: rank(r) = 1 + |rows strictly better than r|
    * under the total order (score desc, doc_id asc), via a broadcast
    * self-join + count — ≤ k² pair evaluations on a ≤k-row frame. A
    * global window is NOT an option here even dressed up: an empty
    * partition spec logs the single-partition warning on every bench
    * tail, and `partitionBy(lit(0))` doesn't help because Catalyst
    * strips foldable window partition expressions back to the empty
    * spec. The join formulation needs no total-order exchange at all
    * (the ≤k-row side broadcasts), and stays deterministic through the
    * doc_id tiebreak. */
  private def joinRank(df: DataFrame, scoreCol: String): DataFrame = {
    // single pass: the upstream pipeline (corpus scan + scoring +
    // top-k) must execute ONCE — a self-join/agg pair would run it
    // twice (measured +1.5 s on bm25 at sf0.1). Collapse the ≤k rows
    // into one array row, rank each element against the array, explode
    // back. O(k²) expression work on a k-row frame, zero extra jobs.
    val cols = df.columns
    def better(p: Column, r: Column): Column =
      p.getField(scoreCol) > r.getField(scoreCol) ||
        (p.getField(scoreCol) === r.getField(scoreCol) &&
          p.getField("doc_id") < r.getField("doc_id"))
    df.agg(collect_list(struct(cols.map(col): _*)).as("_all"))
      .select(explode(transform(col("_all"), r => struct(
        cols.map(c => r.getField(c).as(c)) :+
          (size(filter(col("_all"), p => better(p, r))) + 1)
            .cast("int").as("rank"): _*))).as("_r"))
      .select(col("_r.*"))
      .orderBy("rank")
  }

  /** Shared ranking tail: per-doc long sum, bounded top-k, rank. */
  private def rankTail(perTerm: DataFrame, k: Int): DataFrame =
    joinRank(
      perTerm.groupBy("doc_id")
        .agg(sum(col("term_micros")).as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc_id"))
        .limit(k),
      "score_micros")

  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val dls = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("dl"))
    // 1-row corpus stats; avgdl as one exact double division
    val stats = dls.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      .withColumn("avgdl",
        col("total_dl").cast("double") / col("n_docs").cast("double"))
    val tf = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val perTerm = tf
      .join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(dfs), "tok")
      .select(col("doc_id"), termMicros(k1, b).as("term_micros"))
    rankTail(perTerm, k)
  }

  /** Persist the inverted index: postings `(tok, doc_id, tf, dl)`
    * hash-bucketed AND per-bucket sorted by term (dl denormalized
    * onto each posting — the classic index layout trade: one wide
    * row per posting buys a join-free score), plus the doc-length
    * table for corpus stats. Build cost is one tokenize scan + one
    * (doc, term) aggregate, paid once; every query after reads ONLY
    * its terms' buckets. */
  /** The index rows for a document set: (doc-length table, postings)
    * — ONE derivation shared by build and append so the two paths
    * cannot drift (the termMicros/rankTail discipline applied to the
    * write side). */
  private def indexRows(docs: DataFrame): (DataFrame, DataFrame) = {
    val dls = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("dl"))
    val postings = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
      .join(dls, "doc_id")
      .select("tok", "doc_id", "tf", "dl")
    (dls, postings)
  }

  def writeBm25Index(docs: DataFrame, prefix: String,
      buckets: Int = 32): Unit = {
    val (dls, postings) = indexRows(docs)
    // independent tables, overlapped writes (Layout.inParallel)
    graft.sources.Layout.inParallel(
      () => graft.sources.Layout.writeBucketed(postings,
        s"${prefix}_postings", "tok", buckets),
      () => graft.sources.Layout.writeBucketed(dls,
        s"${prefix}_dls", "doc_id", buckets))
  }

  /** APPEND an increment's postings into an existing index (same
    * bucket spec — Spark validates it), closing the ingest loop the
    * same way the minhash index does: build once, append each epoch,
    * and because df and corpus stats derive from the TABLES at query
    * time, an appended index is indistinguishable from a fresh full
    * build. The append tokenizes and shuffles ONLY the increment. */
  def appendToBm25Index(newDocs: DataFrame, prefix: String,
      buckets: Int = 32): Unit = {
    val spark = newDocs.sparkSession
    // admit only genuinely-new doc_ids: an at-least-once ingest retry
    // (or a re-shipped update) would otherwise duplicate postings and
    // dls rows, silently inflating tf/df/n_docs/avgdl — the anti-join
    // makes the append idempotent (an update flow must delete first,
    // which an append-only index does not support by design)
    // MATERIALIZED before the overlapped writes: both index rows
    // derive from this anti-join against the dls TABLE, and the dls
    // append below mutates that table — an unmaterialized `fresh`
    // re-planned by the postings writer after the dls append commits
    // would see the new rows and anti-join the increment away.
    val fresh = Iterate.materialize(newDocs.join(
      spark.table(s"${prefix}_dls").select("doc_id"),
      Seq("doc_id"), "left_anti"))
    val (dls, postings) = indexRows(fresh)
    graft.sources.Layout.inParallel(
      () => graft.sources.Layout.appendBucketed(postings,
        s"${prefix}_postings", "tok", buckets),
      () => graft.sources.Layout.appendBucketed(dls,
        s"${prefix}_dls", "doc_id", buckets))
  }

  /** BM25 over the PERSISTED index — the retrieval shape that
    * actually scales: the term filter prunes the bucketed postings
    * scan to the query terms' buckets (pinned in PlanQualitySpec), so
    * query cost is proportional to the matching postings, not the
    * corpus; df comes from the pruned postings, corpus stats from the
    * doc-length table (doc-count-sized — a production deployment
    * caches the 1-row aggregate in table metadata at write time).
    * Identical scoring expression and ranking tail as [[bm25TopK]] ⇒
    * identical results, same oracle. */
  def bm25IndexedTopK(spark: org.apache.spark.sql.SparkSession,
      prefix: String, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25IndexedTopK needs at least one term")
    val p = spark.table(s"${prefix}_postings")
      .filter(col("tok").isin(terms: _*))
    val stats = spark.table(s"${prefix}_dls")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .withColumn("avgdl",
        col("total_dl").cast("double") / col("n_docs").cast("double"))
    val dfs = p.groupBy("tok").agg(count(lit(1)).as("df"))
    val perTerm = p
      .crossJoin(broadcast(stats))
      .join(broadcast(dfs), "tok")
      .select(col("doc_id"), termMicros(k1, b).as("term_micros"))
    rankTail(perTerm, k)
  }

  /** Exact phrase search over the positional index: every start
    * offset where the tokens equal `words` consecutively. The
    * positional-alignment formulation (Manning et al., IR ch. 2):
    * a token at position p matching phrase slot i votes for start
    * p−i; a start with ALL |words| distinct slots voting is a match.
    * Repeated phrase words work because votes are per (slot, token
    * instance), and overlapping occurrences emit one row each.
    *
    * Scale shape: one corpus scan; the (word → slot) table is |phrase|
    * rows, broadcast, so non-phrase tokens die in the scan-stage join;
    * the one shuffle is the (doc, start) vote count, map-side
    * combined. No self-join of the positional index (the naive
    * n-way-join plan would shuffle it |words|−1 times). */
  def phrase(docs: DataFrame, words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "phrase must have at least one word")
    val spark = docs.sparkSession
    import spark.implicits._
    val slots = words.zipWithIndex.toDF("tok", "idx")
    docs
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .join(broadcast(slots), "tok")
      .select(col("doc_id"), (col("pos") - col("idx")).as("match_pos"),
        col("idx"))
      .filter(col("match_pos") >= 0)
      .groupBy("doc_id", "match_pos")
      .agg(countDistinct(col("idx")).as("__graft_nhit"))
      .filter(col("__graft_nhit") === words.length.toLong)
      .select(col("doc_id"), col("match_pos").cast("long"))
  }

  /** Top-k salient terms per document, tf-idf-shaped but with the
    * EXACT rational weight `tf/df` in floor micros instead of
    * `tf·ln(N/df)` — same honest trade as [[bm25TopK]]'s rational
    * idf: for a fixed corpus the ranking logic is identical in kind
    * (rewards in-doc frequency, punishes corpus-common terms), and
    * integer floor division is reproducible across engines where a
    * transcendental ln() is not. Ties break on term asc, so the
    * top-k set is fully deterministic.
    *
    * Scale shape: tf is one (doc, term) aggregate off the token
    * explode; df is a second aggregate OVER TF'S OUTPUT (already
    * distinct per doc-term — the corpus is not rescanned); the
    * tf⋈df join is term-keyed and AQE-sized; the per-doc top-k
    * window partitions on doc_id. No driver collection, no
    * vocabulary assumption. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val tf = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micros").desc, col("term"))
    tf.join(df, "term")
      // `div`, not `/`: Spark's `/` on integers is true (double)
      // division; DIV is the exact integer floor both engines share
      .withColumn("score_micros", expr("(tf * 1000000L) DIV df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "df", "score_micros", "rk")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of named ranked
    * lists — the standard hybrid-retrieval combiner (lexical BM25 +
    * vector ANN, or any mix of retrievers). Each input must carry
    * `(doc_id, rank)` with rank 1-based; a document absent from a list
    * contributes nothing for it. The fused score is
    * `Σ_lists 1e6 DIV (k0 + rank)` in EXACT integer micros (`DIV`, the
    * floor both engines share), so fusion is bit-reproducible where
    * the textbook `Σ 1/(k0+rank)` float sum is shuffle-order-dependent.
    * Ties break on doc_id asc. k0 = 60 is the published default.
    *
    * Scale shape: the inputs are top-k lists — bounded by construction
    * (each retriever already did its distributed heavy lifting), so
    * the full-outer fold and the one global window run on ≤ Σ k_i rows
    * no matter the corpus size. Fusion is never the bottleneck; the
    * retrievers are. */
  def rrfFuse(lists: Seq[(String, DataFrame)], k0: Int = 60,
      k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 0 && k >= 1)
    // names are interpolated into column names and the DIV expression:
    // reject non-identifiers (a '-' would parse as subtraction) and
    // duplicates (ambiguous <name>_rank references) up front
    require(lists.forall(_._1.matches("[A-Za-z][A-Za-z0-9_]*")),
      s"list names must be identifiers: ${lists.map(_._1)}")
    require(lists.map(_._1).distinct.size == lists.size,
      s"duplicate list names: ${lists.map(_._1)}")
    val named = lists.map { case (name, df) =>
      df.select(col("doc_id"), col("rank").cast("int")
        .as(s"${name}_rank"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq("doc_id"),
      "full_outer"))
    val contribs = lists.map { case (name, _) =>
      coalesce(expr(s"1000000L DIV ($k0 + ${name}_rank)"), lit(0L))
    }
    // ≤ Σ k_i rows by construction (each input list is already
    // k_i-bounded) — rank via the window-free bounded self-join
    // (see joinRank: a global window would log the single-partition
    // warning, constant partition keys get folded away)
    joinRank(
      joined.withColumn("rrf_micros", contribs.reduce(_ + _).cast("long")),
      "rrf_micros")
      .filter(col("rank") <= k)
  }
}
