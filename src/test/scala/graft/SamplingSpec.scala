package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Sampling}
import graft.sources.Tables

/** The reproducibility contract of deterministic sampling: splits are
  * disjoint + exhaustive, stable across runs and data layout, and hit
  * their fractions within hash tolerance. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")
  import spark.implicits._

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

  test("bestRep elects the highest-quality member; ties go to the " +
      "smallest doc_id; singletons keep themselves") {
    // whitespace-insensitive fingerprint ⇒ 10/11/12 are one class
    // (same words, different raw spacing ⇒ different punct/ws ratios
    // ⇒ different quality); 20/21 are an exact-quality tie class;
    // 30 is a singleton.
    val a1 = "the quick brown fox jumps over the lazy dog"
    val planted = Seq(
      (10L, a1 + "   extra"), // same class as 11/12 after ws collapse?
      (11L, a1 + " extra"),
      (12L, a1 + " extra"),
      (20L, "short tie text"), (21L, "short  tie   text"),
      (30L, "a singleton document all alone")).toDF("doc_id", "text")
    val out = Dedup.bestRep(planted,
      graft.functions.TextFunctions.qualityScore(col("text")))
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getBoolean(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // 10 and 11 and 12 share fp (whitespace-insensitive fingerprint);
    // quality of 10 differs from 11/12 only via raw-text ratios; the
    // class representative must be THE argmax the engine computed —
    // assert structural invariants instead of hardcoding it:
    val classes = out.groupBy(_.getString(1))
    classes.foreach { case (_, rows) =>
      val keeps = rows.filter(_.getBoolean(3))
      assert(keeps.length == 1, "exactly one keep per class")
      val rep = keeps.head.getLong(0)
      val qs = rows.map(r => (r.getDouble(2), -r.getLong(0))).max
      assert((keeps.head.getDouble(2), -rep) == qs,
        "representative is the (quality, -id) argmax")
      rows.filterNot(_.getBoolean(3)).foreach { r =>
        assert(r.getLong(4) == rep, "dup_of points at the rep")
      }
    }
    // the exact-tie class: equal quality ⇒ smaller id wins
    assert(byId(20L)._1 || byId(21L)._1)
    if (byId(20L)._2.isEmpty && byId(21L)._2.contains(20L))
      assert(byId(20L)._1)
    assert(byId(30L)._1 && byId(30L)._2.isEmpty)
  }

  test("stratified: exactly min(k, |stratum|) rows, deterministic " +
      "across repartitionings") {
    val df = (1L to 500L).map(i => (i, s"s${i % 3}")).toDF("id", "st")
    val a = Sampling.topKPerStratum(df, "st", "id", 25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.topKPerStratum(df.repartition(13), "st", "id", 25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "sample must not depend on physical layout")
    assert(a.groupBy(_._2).forall(_._2.size == 25))
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "st")
    val t = Sampling.topKPerStratum(tiny, "st", "id", 5).count()
    assert(t == 3, "k larger than stratum keeps everything")
  }

  test("stratified plans as WindowGroupLimit, not a full sort") {
    val df = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("id", "st")
    val p = Sampling.topKPerStratum(df, "st", "id", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n$p")
  }

  test("qualityRebalance: keep-all band keeps all, fractions bound " +
      "bands, idempotent per shard") {
    val df = (1L to 2000L).map(i => (i, "w " * (i % 120).toInt))
      .toDF("doc_id", "text")
    val q = graft.functions.TextFunctions.qualityScore(col("text"))
    val out = Sampling.qualityRebalance(df, q, col("doc_id"),
      Seq(0.2, 0.4), Seq(0.25, 0.5, 1.0))
    val rows = out.select("doc_id", "band").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // band 2 (keepFrac 1.0) must retain every qualifying row
    val all = df.withColumn("q", q)
      .filter(col("q") >= 0.4).count()
    assert(rows.count(_._2 == 2).toLong == all)
    // md5 thresholds are row-local: running per-shard admits the
    // exact same rows (split by parity and union)
    val s1 = Sampling.qualityRebalance(
      df.filter(col("doc_id") % 2 === 0), q, col("doc_id"),
      Seq(0.2, 0.4), Seq(0.25, 0.5, 1.0))
    val s2 = Sampling.qualityRebalance(
      df.filter(col("doc_id") % 2 === 1), q, col("doc_id"),
      Seq(0.2, 0.4), Seq(0.25, 0.5, 1.0))
    val sharded = s1.unionByName(s2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sharded == rows.map(_._1).toSet)
  }

  test("qualityRebalance: null-quality rows are dropped, not banded " +
      "as worst") {
    // unscorable rows (null score from a scorer that can't rate the
    // row) must not silently land in band 0 and survive at
    // keepFrac(0) — they are filtered before banding, like the ANN
    // paths filter null cosines
    val df = Seq((1L, Option(0.9)), (2L, None),
        (3L, Option(0.1)), (4L, None))
      .toDF("doc_id", "score")
    val out = Sampling.qualityRebalance(df, col("score"), col("doc_id"),
      Seq(0.5), Seq(1.0, 1.0)) // keep everything scorable
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"null-text rows leaked: $kept")
  }
}
