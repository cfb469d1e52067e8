package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Dev tool: stage-by-stage timing of the ngramJaccard pipeline at a
  * given SF dir (default sf0.1). Not part of the driver contract. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    val docs = sources.Tables.load(spark, sfDir, "documents")
    val t = 0.7

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = docs.select(col("doc_id"),
      char_ngram_set(normalize_text(col("text")), 8).as("gs"))
      .filter(col("gs").isNotNull)
      .persist()
    timed("1 base materialize")(base.count())

    val modelSize = sys.env.getOrElse("SPARK_GRAFT_MODEL_SIZE",
      (1 << 16).toString).toInt
    val hotDf: Map[Long, Long] = timed("2 hotDf collect (sampled)") {
      base.filter(pmod(xxhash64(col("doc_id")), lit(4)) === 0)
        .select(explode(col("gs")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .orderBy(col("df").desc, col("g"))
        .limit(modelSize)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    println("[profile] hotDf size=" + hotDf.size)

    val prefix = base
      .select(col("doc_id"), size(col("gs")).as("sz"),
        posexplode(prefix_grams(col("gs"), hotDf, t)))
      .select(col("doc_id"), col("col").as("g"),
        (col("pos") + 1).as("rn"), col("sz"))
    // the candidate-volume guard's exact histogram + its cap decision
    // curve (mirrors Dedup.ngramJaccard's estPairs)
    val hist = timed("2b guard histogram") {
      prefix.groupBy("g").agg(count(lit(1)).as("m"))
        .select(floor(log2(col("m"))).cast("int").as("b"), col("m"))
        .groupBy("b").agg(count(lit(1)).as("ng"),
          sum(col("m").cast("double") * col("m")).as("sm2"),
          sum(col("m").cast("double")).as("sm1"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1)
    }
    // mirrors Dedup.ngramJaccard's bucketMass: m(m−1)/2 pair form
    def bucketMass(c: Long)(h: (Int, Long, Double, Double)): Double = {
      val (b, ng, sm2, sm1) = h
      if ((2L << b) - 1 <= c) (sm2 - sm1) / 2.0
      else math.min(sm2 - sm1, ng.toDouble * c * (c - 1)) / 2.0
    }
    def estPairs(c: Long): Double = hist.map(bucketMass(c)).sum
    Seq(5000, 2500, 1250, 625, 312, 256, 128, 64, 32).foreach(c =>
      println(f"[profile] estPairs(cap=$c) = ${estPairs(c)}%.3e"))
    val budget = sys.env.getOrElse("SPARK_GRAFT_NGRAM_BUDGET",
      "100000000").toLong
    var effCap = 5000
    while (effCap > 64 && estPairs(effCap) > budget)
      effCap = math.max(64, effCap / 2)
    // mirrors the operator's second degrade stage (df-ceiling with
    // deterministic partial admission of the first overflowing band)
    val (dMax: Long, bandHi: Long, bandPpm: Long) =
      if (estPairs(effCap) <= budget) (Long.MaxValue, 0L, 0L)
      else {
        var cum = 0.0; var d = 1L; var hi = 0L; var ppm = 0L
        var stop = false
        for (h <- hist if !stop) {
          val mass = bucketMass(effCap)(h)
          if (cum + mass <= budget) { cum += mass; d = (2L << h._1) - 1 }
          else {
            if (mass > 0) {
              hi = (2L << h._1) - 1
              ppm = ((budget - cum) / mass * 1000000L).toLong
            }
            stop = true
          }
        }
        (d, hi, ppm)
      }
    println(s"[profile] guard effCap=$effCap dMax=$dMax " +
      s"bandHi=$bandHi bandPpm=$bandPpm (budget=$budget)")

    val candidates = prefix
      .groupBy("g")
      .agg(collect_list(struct(col("doc_id"), col("rn"), col("sz")))
        .as("ps"), count(lit(1)).as("m"))
      .filter(col("m") <= dMax ||
        (col("m") <= bandHi &&
          pmod(xxhash64(col("g")), lit(1000000L)) < bandPpm))
      .select(explode(bucket_pairs(col("ps"), effCap, t)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
      .persist()
    timed("3 candidates (group+BucketPairs)")(
      println("[profile] n_cand=" + candidates.count()))

    // Stage 4/5 mirror the operator's BROADCAST verify path, which the
    // operator itself only takes when `setsFitOnDriver` says the gram
    // sets fit (Dedup.scala) — apply the same discipline here instead
    // of collecting half a terabyte of rehearsal corpus onto the
    // driver (the sf10_he run died on spark.driver.maxResultSize).
    // null-safe: sum over zero rows is NULL (empty corpus). The 50M
    // cutoff approximates (does not exactly mirror) the operator's
    // setsFitOnDriver byte gate — close enough for a dev profiler
    // whose job is the stage timings, not bit-identical path choice.
    val totalGrams = Option(base.select(sum(size(col("gs"))))
      .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    if (totalGrams <= 50000000L) {
      val gsets: scala.collection.Map[Long, Array[Long]] = timed("4 sets collect") {
        base.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      }
      val bc = spark.sparkContext.broadcast(gsets)
      val pairs = candidates
        .withColumn("jaccard", broadcast_jaccard(col("id_a"), col("id_b"), bc))
        .filter(col("jaccard") >= t)
      timed("5 verify (broadcast lookup)")(
        println("[profile] n_pairs=" + pairs.count()))
    } else println(s"[profile] 4/5 skipped: $totalGrams grams exceed " +
      "the driver-collect bound (the operator takes its distributed " +
      "verify fallback here)")

    base.unpersist(); candidates.unpersist()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.add(f"job ${j.jobId}: ${(System.nanoTime() -
            starts.getOrDefault(j.jobId, System.nanoTime())) / 1e9}%.2f s")
      })
    val t0 = System.nanoTime()
    val full = graft.operators.Dedup.ngramJaccard(docs,
      pairBudget = budget)
    println(f"[profile] full one-shot op: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=" + full.count())
    Thread.sleep(500)
    jobs.forEach(s => println("[profile] " + s))
    spark.stop()
  }
}
