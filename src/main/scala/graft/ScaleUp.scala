package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale-rehearsal corpus builder: derives a K×-scale copy of
  * a driver testdata dir (10× of sf0.1 ≈ sf1; 100× ≈ sf10) so the
  * headline bench can be measured decades past the largest
  * driver-provided scale factor. NOT part of the graded surface —
  * correctness gates always run on the driver's own parquet.
  *
  * Construction: K key-shifted copies of every fact/dim table (offsets
  * preserve every foreign-key relationship; fixed dimensions region/
  * nation copy once). Text and embeddings are additionally PERMUTED
  * per copy so the shingle/cosine neighborhoods of different copies
  * stay apart — K verbatim copies of each document would give every
  * LSH bucket K× density and ~K²× in-bucket candidate pairs, a
  * quadratic blow-up REAL K× data does not have (fresh documents are
  * mostly novel).
  *
  * The permutation is a deterministic hash-argsort keyed on
  * (copy, length): position j of copy i reads the word at the rank of
  * `xxhash64(i, n, j)` among all positions. Properties that make the
  * rehearsal honest:
  *  - the word MULTISET (and vector element multiset) is unchanged, so
  *    lengths, token counts, quality ratios, vector norms — the
  *    per-row operator costs — are identical to the source rows;
  *  - two copies' permutations are hash-independent, so cross-copy
  *    shared shingles are O(1) — at ANY K, unlike the former
  *    20-prime stride scheme whose strides alias once K exceeds the
  *    usable-prime pool (copies i and i+20 came out verbatim-equal,
  *    planting fake K/20-deep duplicate classes);
  *  - keying on (copy, length) — never doc_id — applies the SAME
  *    permutation to equal-length texts of one copy, so exact
  *    duplicate pairs inside the source stay exact duplicates and a
  *    near-dup pair differing in d positions still differs in exactly
  *    d positions (each divergent position perturbs ≤ shingle-k grams
  *    before AND after, so planted near-dup similarity carries over);
  *  - embeddings permute per (copy, dim) — one permutation for a whole
  *    copy — and any fixed element permutation preserves every
  *    within-copy cosine exactly, so planted ANN neighborhoods
  *    replicate into every copy. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    // "highEntropy" mode (arg 3): additionally remap every word to a
    // length-preserving pseudo-word keyed on (copy, word, position%8) —
    // per-copy vocabulary ×8, and DISJOINT vocabularies across copies,
    // so the gram universe grows ∝K exactly the way fresh documents
    // bring mostly-novel text in a real corpus (the regime the
    // synthetic generator's fixed ~14.5k-gram vocabulary understates by
    // orders of magnitude — K copies over a FIXED gram universe give
    // every posting list K× density and K²× pair mass, a quadratic
    // blow-up real K× data does not have). Aligned positions of
    // equal-length docs of the SAME copy remap identically, so planted
    // exact and near-dup pairs survive; word lengths are preserved
    // exactly, so token/length statistics (per-row operator cost) are
    // unchanged. Used to MEASURE how dedup_ngram_jaccard's
    // prefix-bucket pair mass scales when gram entropy is realistic
    // instead of argued.
    val highEntropy = args.length > 3 && args(3) == "highEntropy"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key offset far above any real key at any sf
    val off = 1000000000L

    def copies(t: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => f(t, i)).reduce(_ unionByName _)

    def shift(cols: String*)(df: DataFrame, i: Int): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * off)))

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name done")
    }

    val rd = (n: String) => graft.sources.Tables.load(spark, src, n)

    write("region", rd("region"))
    write("nation", rd("nation"))
    write("customer", copies(rd("customer"), shift("c_custkey")))
    write("supplier", copies(rd("supplier"), shift("s_suppkey")))
    write("part", copies(rd("part"), shift("p_partkey")))
    write("orders", copies(rd("orders"), shift("o_orderkey", "o_custkey")))
    write("lineitem", copies(rd("lineitem"),
      shift("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", copies(rd("events"), shift("event_id", "user_id")))

    // documents: shift ids, permute word order per copy by the
    // (copy, length)-keyed hash argsort (see the object scaladoc for
    // why this decorrelates at any K while preserving per-row stats
    // and planted duplicate/near-dup structure). Hash ties are broken
    // by position, so the argsort is a total order and the map a
    // bijection for every length.
    write("documents", copies(rd("documents"), (d, i) =>
      shift("doc_id")(d, i)
        .withColumn("_w0", split(col("text"), " "))
        // high-entropy word remap (copy- and position-bucket-salted
        // hash, base-36-encoded and cut/padded to the source word's
        // exact length); identity otherwise
        .withColumn("_w", if (!highEntropy) col("_w0") else expr(
          s"transform(_w0, (w, j) -> substring(rpad(conv(pmod(" +
            s"xxhash64(w, j % 8, $i), 999999999999999999), 10, 36), " +
            s"greatest(length(w), 18), 'x'), 1, length(w)))"))
        .withColumn("_n", size(col("_w")))
        .withColumn("text",
          when(lit(i) === 0 || col("_n") < 2,
            when(lit(highEntropy), array_join(col("_w"), " "))
              .otherwise(col("text")))
          .otherwise(expr(
            s"array_join(transform(array_sort(transform(" +
              s"sequence(0, _n - 1), " +
              s"j -> struct(xxhash64($i, _n, j) AS h, j AS ix))), " +
              s"s -> element_at(_w, s.ix + 1)), ' ')")))
        .drop("_w0", "_w", "_n")))

    // embeddings: shift ids, permute vector elements by ONE hash
    // argsort per copy — a fixed element permutation is norm- and
    // within-copy-cosine-preserving, and hash-independent permutations
    // decorrelate copies at any K (the former stride rotation broke
    // past i=21 at dim 64)
    write("embeddings", copies(rd("embeddings"), (d, i) =>
      shift("vec_id")(d, i)
        .withColumn("_n", size(col("embedding")))
        .withColumn("embedding", when(lit(i) === 0, col("embedding"))
          .otherwise(expr(
            s"transform(array_sort(transform(sequence(0, _n - 1), " +
              s"x -> struct(xxhash64($i, x) AS h, x AS ix))), " +
              s"s -> element_at(embedding, s.ix + 1))")))
        .drop("_n")))

    spark.stop()
  }
}
