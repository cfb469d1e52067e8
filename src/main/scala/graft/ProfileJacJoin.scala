package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** One-shot profiler for the declarative jaccard threshold join's
  * rewritten shape: times the stop-gram training, counts prefix
  * postings, per-gram posting skew, and raw candidate mass, so a scale
  * cliff can be attributed to a stage instead of guessed at.
  * Dev tooling; not part of the engine surface. */
object ProfileJacJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.register(spark, sfDir)
    val d = spark.table("documents")
    val t = 0.7
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val grams = VectorFunctions.char_ngram_set(
      VectorFunctions.normalize_text(col("text")), 8)
    val hotDf: Map[Long, Long] = timed("train") {
      d.filter(pmod(xxhash64(col("text")), lit(4)) === 0)
        .select(grams.as("gs"))
        .filter(col("gs").isNotNull)
        .select(explode(col("gs")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .orderBy(col("df").desc, col("g"))
        .limit(1 << 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    println(s"[prof] model size=${hotDf.size} " +
      s"maxDf=${if (hotDf.isEmpty) 0 else hotDf.values.max}")

    val pfx = d.select(col("doc_id"),
      VectorFunctions.prefix_grams(grams, hotDf, t).as("pg"))
      .select(col("doc_id"), col("pg"), explode(col("pg")).as("g"))
      .persist()
    val nPost = timed("prefix postings")(pfx.count())
    println(s"[prof] postings=$nPost")
    timed("posting skew") {
      pfx.groupBy("g").count().orderBy(col("count").desc)
        .limit(10).collect()
        .foreach(r => println(s"[prof]   gram df=${r.getLong(1)}"))
    }
    val mass = timed("candidate mass") {
      pfx.groupBy("g").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    }
    println(s"[prof] sum df^2 = $mass")

    timed("fused bucket candidates") {
      val pfxp = d.select(col("doc_id"),
        size(grams).as("sz"),
        posexplode(VectorFunctions.prefix_grams(grams, hotDf, t)))
        .select(col("doc_id"), (col("pos") + 1).as("rn"), col("sz"),
          col("col").as("g"))
      val cand = pfxp.groupBy("g")
        .agg(collect_list(struct(col("doc_id").as("doc_id"),
          col("rn").cast("int").as("rn"),
          col("sz").cast("int").as("sz"))).as("ps"))
        .select(explode(VectorFunctions.bucket_pairs(
          col("ps"), 1 << 30, t)).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      val nRaw = cand.count()
      println(s"[prof] fused candidates raw=$nRaw")
      val nDist = cand.distinct().count()
      println(s"[prof] fused candidates distinct=$nDist")
    }
    if (args.length > 1) timed("staged filter selectivity") {
      val a = d.select(col("doc_id").as("id_a"),
        VectorFunctions.prefix_grams(grams, hotDf, t).as("pg_a"),
        size(grams).as("sz_a"))
        .select(col("id_a"), col("pg_a"), col("sz_a"),
          posexplode(col("pg_a")).as(Seq("rn_a", "g")))
      val b = d.select(col("doc_id").as("id_b"),
        VectorFunctions.prefix_grams(grams, hotDf, t).as("pg_b"),
        size(grams).as("sz_b"))
        .select(col("id_b"), col("pg_b"), col("sz_b"),
          posexplode(col("pg_b")).as(Seq("rn_b", "g")))
      val EPS = 1e-9
      val szA = col("sz_a").cast("double")
      val szB = col("sz_b").cast("double")
      val lenF = szB >= ceil(lit(t) * szA - EPS) &&
        szA >= ceil(lit(t) * szB - EPS)
      val posF = least(szA - col("rn_a"), szB - col("rn_b")) >=
        ceil(lit(t / (1 + t)) * (szA + szB) - EPS)
      val canF = col("g") === element_at(
        filter(col("pg_a"), x => array_contains(col("pg_b"), x)), 1)
      val r = a.hint("shuffle_merge").join(b, Seq("g"))
        .select(
          count(lit(1)).as("enum"),
          sum(when(lenF, 1L).otherwise(0L)).as("len_pass"),
          sum(when(lenF && posF, 1L).otherwise(0L)).as("pos_pass"),
          sum(when(lenF && posF && canF, 1L).otherwise(0L)).as("can_pass"))
        .collect()(0)
      println(s"[prof] enum=${r.getLong(0)} len=${r.getLong(1)} " +
        s"pos=${r.getLong(2)} canon=${r.getLong(3)}")
    }
    val cand = timed("candidate join count") {
      val a = pfx.select(col("doc_id").as("id_a"), col("pg").as("pg_a"),
        col("g"))
      val b = pfx.select(col("doc_id").as("id_b"), col("pg").as("pg_b"),
        col("g"))
      a.join(b, Seq("g")).filter(col("id_a") < col("id_b") &&
          col("g") === array_min(array_intersect(col("pg_a"), col("pg_b"))))
        .count()
    }
    println(s"[prof] canonical candidates=$cand")
    spark.stop()
  }
}
