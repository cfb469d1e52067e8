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
}
