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
}
