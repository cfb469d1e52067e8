package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale-rehearsal corpus builder: derives a K×-scale copy of
  * a driver testdata dir (default 10× of sf0.1 ≈ sf1) so the headline
  * bench can be measured one decade past the largest driver-provided
  * scale factor. NOT part of the graded surface — correctness gates
  * always run on the driver's own parquet.
  *
  * Construction: K key-shifted copies of every fact/dim table (offsets
  * preserve every foreign-key relationship; fixed dimensions region/
  * nation copy once). Text and embeddings are additionally ROTATED per
  * copy (word-array rotation by a copy-dependent stride; embedding
  * element rotation) so the shingle/cosine neighborhoods of different
  * copies stay apart — 10 verbatim copies of each document would give
  * every LSH bucket 10× density and ~100× in-bucket candidate pairs,
  * a quadratic blow-up REAL 10× data does not have (fresh documents
  * are mostly novel). Rotation keeps per-copy length/token statistics
  * and vector norms identical, so per-row operator cost is unchanged —
  * only the artificial cross-copy duplicate structure is removed. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
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

    // documents: shift ids, permute word order per copy by a
    // per-copy prime STRIDE coprime to the word count. A stride
    // permutation places originally-distance-p words adjacent, so
    // word-shingle sets of different copies (and vs the original) are
    // ~disjoint — a cyclic shift would preserve nearly every adjacent
    // pair and hand the dedup families an artificial 10-deep
    // near-duplicate class per document (quadratic in-bucket candidate
    // blow-up real fresh data does not have). The word MULTISET is
    // unchanged, so lengths, token counts and quality ratios — the
    // per-row operator costs — are identical to the source rows.
    val P = "array(3,5,7,11,13,17,19,23,29,31," +
      "37,41,43,47,53,59,61,67,71,73)"
    write("documents", copies(rd("documents"), (d, i) =>
      shift("doc_id")(d, i)
        .withColumn("_w", split(col("text"), " "))
        .withColumn("_n", size(col("_w")))
        // the i-th USABLE prime: usable = coprime to n (else the map
        // is not a bijection) AND not ≡ 1 mod n (else the permutation
        // is the identity and the copy is verbatim). Indexing the
        // filtered list by i — not first-fit from slot i — keeps
        // strides distinct across copies even when early primes are
        // unusable (first-fit let copy 1 and copy 2 both land on 7
        // whenever 5 | n, planting the exact cross-copy duplicates
        // this permutation exists to prevent).
        .withColumn("_u", expr(
          s"filter($P, p -> _n % p != 0 AND p % _n != 1)"))
        // branch-guarded: i % size(_u) divides by zero under ANSI when
        // no prime is usable (tiny n) — those rows keep the original
        .withColumn("_p", when(size(col("_u")) > 0, expr(
          s"element_at(_u, int($i % size(_u)) + 1)")))
        .withColumn("text",
          when(lit(i) === 0 || col("_n") < 2 ||
              size(col("_u")) === 0 || col("_p").isNull,
            col("text"))
          .otherwise(expr(
            "array_join(transform(sequence(0, _n - 1), " +
              "j -> element_at(_w, int(pmod(j * _p, _n)) + 1)), ' ')")))
        .drop("_w", "_n", "_u", "_p")))

    // embeddings: shift ids, rotate vector elements per copy (norm-
    // preserving decorrelation)
    write("embeddings", copies(rd("embeddings"), (d, i) =>
      shift("vec_id")(d, i)
        .withColumn("_n", size(col("embedding")))
        // distinct per-copy rotation strides (3i+1 < dim for k ≤ 21 at
        // dim 64) — i%8 would alias copy 8 back onto copy 0 verbatim
        .withColumn("embedding", when(lit(i) === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), lit(3 * i + 2),
              col("_n") - lit(3 * i + 1)),
            slice(col("embedding"), lit(1), lit(3 * i + 1)))))
        .drop("_n")))

    spark.stop()
  }
}
