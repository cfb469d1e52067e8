package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Dev diagnostic for the exact-jaccard candidate generator's global
  * gram order (NOT part of the driver contract): measures, on a given
  * corpus, (a) the TRUE gram document-frequency distribution, (b) the
  * df coverage of the bounded hot-gram model at several model sizes
  * (the df value at the model's admission rank — every gram below it
  * is ordered as df=1, i.e. effectively hash-ordered), and (c) the
  * resulting prefix-posting candidate mass Σ_g C(m_g, 2) under the
  * MODEL order versus the FULL true-df order (computed the expensive
  * way: a corpus-wide df join + per-doc window — the two shuffles
  * PrefixGrams exists to avoid).
  *
  * Decision data for whether the dense-regime leak is model COVERAGE
  * (unknown mid-df grams rank as df=1 and land in prefixes they would
  * not survive under their true rank) or intrinsic to df-ordered
  * prefix filtering on this gram distribution.
  *
  * Usage: GramDfDiag [sfDir] (default $SPARK_GRAFT_SF_DIR or sf0.1)
  * SPARK_GRAFT_DFDIAG_LITE=1 runs only the postings/estPairs mass
  * comparison (model k=64k vs true order) — the plan-time quantities
  * the rewrite's sparse-branch crossover gate is calibrated on —
  * skipping the df-band histogram, tau probes, 1M model and capDiag.
  */
object GramDfDiag {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = sys.env.getOrElse("SPARK_GRAFT_JACCARD_T", "0.7").toDouble
    val n = 8
    val spark = Engine.session()
    val docs = sources.Tables.load(spark, sfDir, "documents")

    val base = docs.select(col("doc_id"),
      char_ngram_set(normalize_text(col("text")), n).as("gs"))
      .filter(col("gs").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = base.count()
    println(s"[dfdiag] docs=$nDocs")

    // ---- (a) TRUE df distribution (full corpus, exact) ----
    val dfAll = base.select(explode(col("gs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lite = sys.env.contains("SPARK_GRAFT_DFDIAG_LITE")
    val nGrams = dfAll.count()
    val nGe2 = dfAll.filter(col("df") >= 2).count()
    println(s"[dfdiag] grams=$nGrams df>=2=$nGe2")
    if (!lite) dfAll.groupBy(floor(log2(col("df"))).cast("int").as("b"))
      .agg(count(lit(1)).as("ng"), sum("df").as("occ"),
        sum(col("df").cast("double") * (col("df") - 1) / 2.0).as("mass"))
      .orderBy("b").collect().foreach { r =>
        println(f"[dfdiag] dfband=${r.getInt(0)}%2d grams=${r.getLong(1)}%12d " +
          f"occ=${r.getLong(2)}%14d allPairMass=${r.getDouble(3)}%.3e")
      }

    // ---- (b) model-admission df at candidate model sizes ----
    // tau(K) = df of the K-th gram under (df desc): the model knows
    // every gram with df > tau; everything below is ordered as df=1.
    for (k <- Seq(1 << 16, 1 << 18, 1 << 20) if !lite) {
      if (nGe2 > k) {
        val tau = dfAll.filter(col("df") >= 2)
          .orderBy(col("df").desc, col("g")).limit(k)
          .agg(min("df")).head().getLong(0)
        println(s"[dfdiag] tau(model=$k) = $tau (grams below are " +
          "hash-ordered)")
      } else {
        println(s"[dfdiag] tau(model=$k): model covers ALL $nGe2 " +
          "df>=2 grams")
      }
    }

    // ---- (c) prefix-posting mass: model order vs true order ----
    def massOf(prefix: org.apache.spark.sql.DataFrame,
        label: String): Unit = {
      val hist = prefix.groupBy("g").agg(count(lit(1)).as("m"))
        .groupBy(floor(log2(col("m"))).cast("int").as("b"))
        .agg(count(lit(1)).as("ng"),
          sum(col("m").cast("double") * col("m")).as("sm2"),
          sum(col("m").cast("double")).as("sm1"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
        .sortBy(_._1)
      def bucketMass(c: Long)(h: (Int, Long, Double, Double)): Double = {
        val (b, ng, sm2, sm1) = h
        if ((2L << b) - 1 <= c) (sm2 - sm1) / 2.0
        else math.min(sm2 - sm1, ng.toDouble * c * (c - 1)) / 2.0
      }
      val postings = hist.map(_._4).sum
      Seq(Long.MaxValue, 5000L, 1250L, 312L, 128L, 64L).foreach { c =>
        val m = hist.map(bucketMass(c)).sum
        val cs = if (c == Long.MaxValue) "none" else c.toString
        println(f"[dfdiag] $label postings=$postings%.3e " +
          f"estPairs(cap=$cs) = $m%.3e")
      }
    }

    // ---- (d) df-cap decomposition: the judge's df-capped-candidate
    // hypothesis decomposes the prefix-bucket mass by the POSTED
    // gram's TRUE df. Bucket occupancy occ(g) = #prefixes containing
    // g is a pure function of the global order (a cap only decides
    // whether a bucket EMITS — it cannot shrink any occupancy), so
    // Σ C(occ,2) is cap-invariant per order and the only question is
    // how much of it sits above a cap D and who posts there. The
    // residual-classification theorem (Dedup.scala, df-cap note) says:
    // under the df-ASC order a doc posts a df>D gram iff its ≤D-df
    // gram count is below its prefix length — so hot buckets hold
    // only "residual" (boilerplate-dominated) docs, and |R_D| bounds
    // the escape-hatch tier's input.
    def capDiag(label: String,
        postingDfIn: org.apache.spark.sql.DataFrame): Unit = {
      // persisted: the residualDocs probe below re-reads the posting
      // frame once per cap value — without this the TRUE-DF call
      // would re-run the corpus-wide df join + per-doc window four
      // extra times
      val postingDf = postingDfIn.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val withOcc = postingDf
        .groupBy("g").agg(count(lit(1)).as("m"), first("df").as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Seq(1000L, 10000L, 100000L, 1000000L).foreach { d =>
        val r = withOcc.agg(
          sum(when(col("df") > d,
            col("m").cast("double") * (col("m") - 1) / 2.0))
            .as("hotMass"),
          sum(when(col("df") <= d,
            col("m").cast("double") * (col("m") - 1) / 2.0))
            .as("coldMass")).head()
        val hot = Option(r.get(0)).fold(0.0)(_ => r.getDouble(0))
        val cold = Option(r.get(1)).fold(0.0)(_ => r.getDouble(1))
        val residual = postingDf.filter(col("df") > d)
          .select(countDistinct("doc_id")).head().getLong(0)
        println(f"[dfdiag] $label D=$d%-8d hotMass=$hot%.3e " +
          f"coldMass=$cold%.3e residualDocs=$residual")
      }
      withOcc.unpersist(); postingDf.unpersist()
    }

    // model order at the operator's default size and a 16x size
    for (k <- if (lite) Seq(1 << 16) else Seq(1 << 16, 1 << 20)) {
      val hotDf: Map[Long, Long] = base
        .filter(pmod(xxhash64(col("doc_id")), lit(4)) === 0)
        .select(explode(col("gs")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .orderBy(col("df").desc, col("g"))
        .limit(k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"[dfdiag] model k=$k actual=${hotDf.size}")
      val prefix = base
        .select(col("doc_id"), size(col("gs")).as("sz"),
          posexplode(prefix_grams(col("gs"), hotDf, t)))
        .select(col("doc_id"), col("col").as("g"))
      massOf(prefix, s"MODEL(k=$k)")
      if (k == (1 << 16) && !lite)
        capDiag(s"MODEL(k=$k)", prefix.join(dfAll, "g")
          .select(col("doc_id"), col("g"), col("df")))
    }

    // TRUE order: df join + per-doc window — exact ranks everywhere
    val posting = base
      .select(col("doc_id"), size(col("gs")).as("sz"),
        explode(col("gs")).as("g"))
      .join(dfAll, "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("g").asc)))
      .filter(col("rn") <=
        greatest(least(col("sz") -
          ceil(lit(t) * col("sz") - 1e-9) + 1, col("sz")), lit(1)))
      .select(col("doc_id"), col("g"), col("df"))
    massOf(posting, "TRUE-DF")
    if (!lite) capDiag("TRUE-DF", posting)

    base.unpersist(); dfAll.unpersist()
    spark.stop()
  }
}
