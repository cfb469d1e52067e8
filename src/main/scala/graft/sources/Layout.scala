package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tooling for the 100 TB design story. At scale, layout
  * decisions — bucketing, partitioning — are what remove the shuffles
  * that dominate join/agg cost; this is the Spark-native generalization
  * of the reference's static fragment catalog
  * (`QueryService.asmx.cs:310-427`), where "which site holds which rows"
  * becomes "which bucket/partition holds which rows", chosen by key
  * instead of hardcoded.
  */
object Layout {

  /** Drop a managed table AND its on-disk location — a fresh in-memory
    * catalog doesn't know about leftovers from a previous session, and
    * CREATE TABLE refuses to reuse an existing managed location. */
  private def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
  }

  /** Run independent write jobs CONCURRENTLY from a small pool (the
    * guide's overlap-independent-jobs move): Spark's scheduler happily
    * runs several jobs at once, so two index-table writes that share
    * no output overlap instead of serializing their commit tails —
    * the second job's tasks back-fill executors the first job's tail
    * frees. Callers must pre-materialize any SHARED persisted input
    * (e.g. one count()) or both jobs race to build the same cache.
    * Spark local properties (job group/description) are inheritable-
    * thread-local, so jobs submitted from the pool keep the caller's
    * labels. Failures rethrow the original cause. */
  def inParallel(tasks: (() => Unit)*): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val fs = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      fs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            // a failed write must not leave its SIBLING committing a
            // half-pair index behind the caller's back: cancel every
            // other task (interrupting — Spark job submission waits
            // are interruptible) before rethrowing, so the caller
            // observes the failure with no writer still in flight
            fs.foreach(_.cancel(true))
            pool.shutdownNow()
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }

  /** Persist `df` hash-bucketed (and per-bucket sorted) by `key` into the
    * session catalog. Two tables bucketed the same way join/aggregate on
    * the bucket key with NO shuffle — the co-located join the reference
    * approximated by manual fragment placement. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Append into an existing bucketed table with the SAME bucket spec
    * (Spark validates it) — the ingest-loop counterpart of
    * [[writeBucketed]], one write-spec definition for both paths. */
  def appendBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Persist `df` directory-partitioned by `partCol` (e.g. order year):
    * predicates on the partition column prune whole directories at
    * planning time — the scan never lists, let alone reads, them. */
  def writePartitioned(df: DataFrame, table: String, partCol: String): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCol).saveAsTable(table)
  }

  /** True if the executed plan contains any shuffle exchange (broadcast
    * exchanges don't count — they're the cheap kind). Walks the plan
    * tree matching node types — robust to plan-string drift — and
    * unwraps AQE wrappers (AdaptiveSparkPlanExec holds the current
    * plan; materialized stages hide their exchange inside a leaf
    * QueryStageExec). */
  /** Small-file compaction — the table-maintenance operator every
    * long-lived 100 TB dataset needs: streaming ingest and per-epoch
    * appends leave thousands of KB-sized files whose open/footer
    * overhead eventually dominates scan cost. Rewrite the table into
    * files of ~`targetBytes` by coalescing on MEASURED input size
    * (sum of file lengths — no data pass, no guess), never fewer than
    * one partition. Coalesce, not repartition: compaction must not pay
    * a shuffle — partitions concatenate locally and row VALUES are
    * untouched (spec-checked content equality; file count shrinks).
    * Writes to a fresh directory and returns its path — atomicity at
    * scale comes from swapping table pointers, never in-place
    * rewrites. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
      targetBytes: Long = 128L << 20): String = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val input = new java.io.File(inputDir)
    val totalBytes = Option(input.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inputDir)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outputDir)
    outputDir
  }

  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ShuffleExchangeLike => true
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}

/** Z-order (Morton-curve) layout: cluster a table on TWO dimensions at
  * once so min/max file statistics prune on EITHER predicate column.
  * A single-column sort gives perfect pruning on that column and none
  * on any other; interleaving the bits of both columns' normalized
  * cell numbers keeps every file to a small rectangle of the 2-D key
  * space, so a selective filter on either column overlaps only the
  * files whose rectangle crosses it (~sqrt(files) instead of all of
  * them). This is the layout lever behind "OPTIMIZE ZORDER BY" in
  * lakehouse engines, expressed as plain Spark: the z-value is a pure
  * codegen'd column expression, the write is repartitionByRange on it.
  * At 100 TB this is the difference between a two-predicate scan
  * reading every file and reading a band of them — parquet row-group
  * stats and file listing both skip on the same min/max math this
  * module demonstrates per-file.
  */
object ZOrder {

  /** Normalized cell number in [0, 2^bits) for `c` over [lo, hi] —
    * values are clamped, then mapped by exact double arithmetic
    * (exact for spans below 2^52, i.e. any realistic key domain).
    * lo/hi are Columns so callers can derive bounds from the data
    * itself (one tiny agg, broadcast everywhere). */
  def zCell(c: Column, lo: Column, hi: Column, bits: Int): Column =
    floor((least(greatest(c, lo), hi) - lo).cast("double") *
      (1L << bits).toDouble / (hi - lo + lit(1)).cast("double"))
      .cast("long")

  /** Interleave the low `bits` bits of two cell numbers: bit i of `a`
    * lands at 2i, bit i of `b` at 2i+1. Disjoint targets, so the OR
    * fold stays a single whole-stage-codegen expression tree. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "z-value must fit a long")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-value of (a, b) over explicit inclusive bounds. */
  def zValue(a: Column, aLo: Column, aHi: Column,
      b: Column, bLo: Column, bHi: Column, bits: Int): Column =
    interleaveBits(zCell(a, aLo, aHi, bits), zCell(b, bLo, bHi, bits), bits)

  /** Write `df` into `nFiles` parquet files, each holding a contiguous
    * z-range of (cols). Range partitioning samples real quantiles, so
    * files are balanced even under key skew. */
  def writeZOrdered(df: DataFrame, path: String, z: Column,
      nFiles: Int): Unit =
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of two columns — the same statistics parquet
    * footers carry, materialized for the skipping arithmetic. */
  def fileStats(spark: SparkSession, path: String,
      a: String, b: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(a).as("a_min"), max(a).as("a_max"),
        min(b).as("b_min"), max(b).as("b_max"))

  /** How many files a range predicate lo..hi on the column tracked as
    * (minCol, maxCol) CANNOT skip — the files a real scan would read. */
  def overlappingFiles(stats: DataFrame, minCol: String, maxCol: String,
      lo: Long, hi: Long): Long =
    stats.filter(col(maxCol) >= lo && col(minCol) <= hi).count()
}

/** Skew mitigation: salted two-phase aggregation. AQE's skew-join
  * handling covers joins; hot *grouping* keys are handled by salting the
  * first phase so one key's rows spread over `saltFactor` reducers, then
  * merging partials. Results are identical; the hot key's work is
  * parallelized. */
object Skew {

  /** groupBy(key).count/sum equivalents computed as salt-partial +
    * final merge. `aggs` maps output name → (partial agg on salted
    * groups, final merge of partials). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_pc"),
        sum(round(col(valueCol) * 100).cast("long")).as("_ps"))
      .groupBy(col(key))
      .agg(sum("_pc").as("n"),
        (sum("_ps") / 100.0).as("total"))
  }

  /** Skew-salted equi-join: a hot join key sends ALL its fact rows to
    * one reducer in a plain shuffle join; salting composes the join
    * key with a deterministic per-row salt (so one key's rows spread
    * over `saltFactor` reducers) and replicates each build-side row
    * once per salt value. Result ≡ the plain inner join — each fact
    * row meets each matching dim row in exactly one salt slot. Use
    * when the build side is too big to broadcast and AQE's runtime
    * skew split isn't available (e.g. the join feeds a co-partitioned
    * downstream op). `saltExpr` must be deterministic per fact row
    * (e.g. a hash of its primary key — NOT rand(), which breaks
    * retry/replay semantics at scale). */
  def saltedEquiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, saltExpr: Column,
      saltFactor: Int = 8): DataFrame = {
    val f = fact.withColumn("_salt",
      pmod(saltExpr, lit(saltFactor.toLong)).cast("int"))
    val d = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    f.join(d, f(factKey) === d(dimKey) && f("_salt") === d("_salt"))
      .drop("_salt")
  }
}
