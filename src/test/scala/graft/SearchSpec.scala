package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "rust is fast and spark is distributed"),
    (2L, "spark spark spark spark spark spark"),
    (3L, "a note about gardening and soil"),
    (4L, "spark streaming with watermark spark"),
    (5L, "the rare word xylophone appears here")
  ).toDF("doc_id", "text")

  test("rare term outranks common term hits") {
    val r = Search.bm25TopK(docs, Seq("spark", "xylophone"), k = 10)
      .collect()
    // df(spark)=3, df(xylophone)=1 -> idf 0.71 vs 1.67: doc 5 wins
    // despite tf=1, then the spark docs by saturated tf and length
    assert(r.head.getLong(0) === 5L)
    assert(r.map(_.getLong(0)).toSet === Set(1L, 2L, 4L, 5L))
    assert(r.map(_.getInt(2)).toSeq === (1 to 4))
  }

  test("tf saturates: six hits do not score six times one hit") {
    val r = Search.bm25TopK(docs, Seq("spark"), k = 10).collect()
    val byId = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byId(2L) < 6 * byId(1L))
    assert(byId(2L) > byId(1L)) // but more hits still score higher
  }

  test("k truncates and non-matching docs never appear") {
    val r = Search.bm25TopK(docs, Seq("spark"), k = 2).collect()
    assert(r.length === 2)
    assert(!r.map(_.getLong(0)).contains(3L))
  }

  test("empty term list is rejected") {
    intercept[IllegalArgumentException] {
      Search.bm25TopK(docs, Seq.empty)
    }
  }

  test("phrase: consecutive matches only, overlaps and repeated " +
      "words emit every start") {
    val d = Seq(
      (1L, "table scan is a table scan"),
      (2L, "scan table"), // reversed: no match
      (3L, "table x scan"), // gap: no match
      (4L, "batch batch batch")) // repeated-word phrase below
      .toDF("doc_id", "text")
    val r1 = Search.phrase(d, Seq("table", "scan"))
      .orderBy("doc_id", "match_pos")
      .as[(Long, Long)].collect()
    assert(r1.toSeq === Seq((1L, 0L), (1L, 4L)))
    // "batch batch" occurs at starts 0 and 1 (overlapping)
    val r2 = Search.phrase(d, Seq("batch", "batch"))
      .orderBy("doc_id", "match_pos")
      .as[(Long, Long)].collect()
    assert(r2.toSeq === Seq((4L, 0L), (4L, 1L)))
  }

  test("phrase: single-word phrase degenerates to term positions") {
    val d = Seq((1L, "a b a")).toDF("doc_id", "text")
    val r = Search.phrase(d, Seq("a")).orderBy("match_pos")
      .as[(Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 0L), (1L, 2L)))
  }

  test("tfidf: in-doc frequency up, corpus-common terms down, " +
      "pinned tie-break") {
    val d = Seq(
      (1L, "common rare rare"),
      (2L, "common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val r = Search.tfidfTopTerms(d, 2)
      .orderBy("doc_id", "rk").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(4)))
    // doc 1: rare tf=2 df=1 -> 2e6; common tf=1 df=3 -> 333333
    assert(r(0) === ((1L, "rare", 2000000L)))
    assert(r(1) === ((1L, "common", 333333L)))
    // docs 2/3: unique term (1e6) beats common (333333)
    assert(r(2)._2 === "other" && r(4)._2 === "thing")
  }

  test("rrf: a doc in both lists beats either single-list winner, " +
      "absent lists contribute zero, ties break on doc_id") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val r = Search.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k0 = 60,
      k = 10).collect()
    // doc 20: 1e6/62 + 1e6/61 = 16129+16393 = 32522 beats doc 10's
    // 1e6/61 = 16393 despite doc 10 topping the lexical list
    assert(r.head.getLong(0) === 20L)
    assert(r.head.getLong(3) === 32522L)
    val byId = r.map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(byId(10L) === 16393L) // single-list: one contribution only
    assert(byId(40L) === 16129L)
    // docs 10 (lex rank 1) and 40 (vec rank 2)? different scores; but
    // 30 (lex 3: 15873) vs nothing — full ordering is deterministic
    assert(r.map(_.getLong(0)).toSeq === Seq(20L, 10L, 40L, 30L))
    // fused rank is dense 1..n
    assert(r.map(_.getInt(4)).toSeq === (1 to 4))
  }

  test("bm25 index append is idempotent: re-shipping already-indexed " +
      "docs changes nothing (at-least-once ingest retry)") {
    Search.writeBm25Index(docs, "spec_bm25_idem", buckets = 4)
    val before = Search.bm25IndexedTopK(spark, "spec_bm25_idem",
      Seq("spark"), k = 10).collect().toSeq
    // retry: the same docs arrive again — the anti-join must admit none
    Search.appendToBm25Index(docs, "spec_bm25_idem", buckets = 4)
    val after = Search.bm25IndexedTopK(spark, "spec_bm25_idem",
      Seq("spark"), k = 10).collect().toSeq
    assert(after === before)
    // and the indexed path equals the live scan
    val live = Search.bm25TopK(docs, Seq("spark"), k = 10).collect().toSeq
    assert(after === live)
  }

  test("rrf: equal-score ties order by doc_id ascending") {
    val a = Seq((7L, 1), (3L, 2)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (7L, 2)).toDF("doc_id", "rank")
    val r = Search.rrfFuse(Seq("a" -> a, "b" -> b), k0 = 60, k = 10)
      .collect()
    // both docs score 1e6/61 + 1e6/62 — tie; 3 < 7 wins rank 1
    assert(r.map(_.getLong(0)).toSeq === Seq(3L, 7L))
  }
}
