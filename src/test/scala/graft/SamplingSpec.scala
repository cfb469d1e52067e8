package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.sources.Tables

/** The reproducibility contract of deterministic sampling: splits are
  * disjoint + exhaustive, stable across runs and data layout, and hit
  * their fractions within hash tolerance. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")

  test("splitByHash: disjoint, exhaustive, and fraction-accurate") {
    val split = Sampling.splitByHash(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val n = docs.count()
    assert(split.count() === n) // exhaustive, no row lost or duplicated
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === n)
    // fractions within a loose tolerance (50 docs at sf0.001 — the
    // guarantee is determinism, not variance; exactness of the ranges
    // is covered by the bucket math itself)
    assert(counts("train") > counts("val") &&
      counts("train") > counts("test"))
  }

  test("assignments are stable across runs and repartitioning") {
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.splitByHash(df, col("doc_id"),
        Seq("a" -> 0.5, "b" -> 0.5))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val once = assign(docs)
    val again = assign(docs.repartition(7)) // layout must not matter
    assert(once === again)
  }

  test("sampleByHash is a subset relation as fraction grows") {
    val small = Sampling.sampleByHash(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.sampleByHash(docs, col("doc_id"), 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big)) // nested samples: grow without churn
    assert(big.size > small.size)
  }

  test("weighted mix: multiplicity is floor(w) or floor(w)+1, copies " +
      "numbered, unlisted sources dropped, deterministic") {
    val w = Map("src0" -> 2.2, "src1" -> 0.5)
    val mixed = Sampling.weightedMix(docs, col("doc_id"),
      col("source"), w)
    val perDoc = mixed.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"),
        max("copy_id").as("mx"), min("copy_id").as("mn"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (src, n) = (r.getString(1), r.getLong(2))
      src match {
        case "src0" => assert(n == 2L || n == 3L)
        case "src1" => assert(n == 1L) // 0-copy rows don't appear
        case other => fail(s"unlisted source $other survived")
      }
      // copies are 0..n-1
      assert(r.getLong(4) === 0L && r.getLong(3) === n - 1)
    }
    // expected-multiplicity: src0 averages ~2.2 copies
    val src0 = perDoc.filter(_.getString(1) == "src0")
    val avg = src0.map(_.getLong(2)).sum.toDouble / src0.length
    assert(avg > 2.0 && avg < 2.5, s"avg $avg")
    // pure function of the key: a second run mixes identically
    val again = Sampling.weightedMix(docs, col("doc_id"),
      col("source"), w).collect().map(r =>
      (r.getLong(0), r.getLong(r.length - 1))).toSet
    val first = mixed.collect().map(r =>
      (r.getLong(0), r.getLong(r.length - 1))).toSet
    assert(again === first)
  }

  test("stratified sampling keeps only configured strata at their rate") {
    val sampled = Sampling.sampleStratified(docs, col("doc_id"),
      col("lang"), Map("en" -> 1.0))
    val langs = sampled.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs === Set("en"))
    val allEn = docs.filter(col("lang") === "en").count()
    assert(sampled.count() === allEn) // fraction 1.0 keeps everything
  }

  test("domain cap: parse_url host, at most cap kept per host, " +
      "and survivors are the best-quality rows of their host") {
    val url = concat(lit("https://"), col("source"), lit("-"),
      pmod(col("doc_id"), lit(7L)), lit(".example.com/docs/"),
      col("doc_id"))
    val capped = Sampling.domainCap(docs, url,
      graft.functions.TextFunctions.qualityScore(col("text")), cap = 3)
      .cache()
    try {
      // host came out of parse_url, not string surgery on our side
      assert(capped.filter(!col("host").rlike(
        "^src\\d+-\\d\\.example\\.com$")).count() === 0L)
      // the cap holds per host, every row is ranked, kept ⇔ rank<=cap
      assert(capped.filter(col("kept")).groupBy("host").count()
        .filter(col("count") > 3).count() === 0L)
      assert(capped.filter(col("kept") =!= (col("rank") <= 3))
        .count() === 0L)
      // no dropped row outranks (strictly better quality than) a kept
      // one on the same host
      val kept = capped.filter(col("kept"))
        .groupBy("host").agg(min("q_micros").as("worst_kept"))
      assert(capped.filter(!col("kept")).join(kept, "host")
        .filter(col("q_micros") > col("worst_kept")).count() === 0L)
      // every row survives with a verdict (nothing silently dropped)
      assert(capped.count() === docs.count())
    } finally capped.unpersist()
  }
}
