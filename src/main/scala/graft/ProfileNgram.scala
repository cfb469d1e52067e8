package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Dev tool: stage-by-stage timing of the ngramJaccard pipeline at a
  * given SF dir (default sf0.1). Not part of the driver contract. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    val docs = sources.Tables.load(spark, sfDir, "documents")
    val t = 0.7
    val EPS = 1e-9

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = docs.select(col("doc_id"),
      array_distinct(char_ngram_hashes(normalize_text(col("text")), 8))
        .as("gs"))
      .filter(col("gs").isNotNull)
      .persist()
    timed("1 base materialize")(base.count())

    val hotDf: Map[Long, Long] = timed("2 hotDf collect") {
      base.select(explode(col("gs")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .orderBy(col("df").desc, col("g"))
        .limit(1 << 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    println("[profile] hotDf size=" + hotDf.size)

    val prefix = base
      .select(col("doc_id"), size(col("gs")).as("sz"),
        posexplode(prefix_grams(col("gs"), hotDf, t)))
      .select(col("doc_id"), col("col").as("g"),
        (col("pos") + 1).as("rn"), col("sz"))
    val capped = prefix
      .withColumn("pn", row_number().over(
        Window.partitionBy("g").orderBy("doc_id")))
      .filter(col("pn") <= 5000)
      .drop("pn")
      .persist()
    timed("3 capped materialize")(capped.count())

    val a = capped.as("a"); val b = capped.as("b")
    val alpha = lit(t / (1 + t)) * (col("a.sz") + col("b.sz")) - EPS
    val candidates = a.join(b,
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz").cast("double") >= lit(t) * col("a.sz") - EPS &&
          col("a.sz").cast("double") >= lit(t) * col("b.sz") - EPS &&
          (least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1)
            .cast("double") >= alpha)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .persist()
    timed("4 candidates")(println("n_cand=" + candidates.count()))

    val sets = base.withColumn("n", size(col("gs")).cast("long"))
    val pairs = candidates
      .join(sets.select(col("doc_id").as("id_a"), col("gs").as("gs_a"),
        col("n").as("n_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("gs").as("gs_b"),
        col("n").as("n_b")), Seq("id_b"))
      .withColumn("n_common",
        size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= t)
    timed("5 verify+count")(println("n_pairs=" + pairs.count()))
    timed("6 verify+sort+localCheckpoint") {
      pairs.orderBy("id_a", "id_b").localCheckpoint(true)
    }

    base.unpersist(); capped.unpersist(); candidates.unpersist()
    val t0 = System.nanoTime()
    val full = graft.operators.Dedup.ngramJaccard(docs)
    println(f"[profile] full one-shot op: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=" + full.count())
    spark.stop()
  }
}
