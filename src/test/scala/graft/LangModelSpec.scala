package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LangModel

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corpus-typical bigrams outscore singleton bigrams") {
    // "the cat sat" appears 3x -> its bigrams are corpus-frequent;
    // doc 4 is all singleton bigrams and must score lowest
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat sat"),
      (3L, "the cat sat"),
      (4L, "zeta omega kappa")).toDF("doc_id", "text")
    val r = LangModel.bigramScore(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) === r(2L) && r(2L) === r(3L))
    assert(r(4L) < r(1L))
    // exact arithmetic: V = 6 distinct tokens; c(the cat)=3,
    // c(the .)=3 -> (1e6*4) DIV (3+6) = 444444 for both bigrams
    assert(r(1L) === 444444L)
    // doc 4: c_ab=1, c_a=1 -> (1e6*2) DIV (1+6) = 285714
    assert(r(4L) === 285714L)
  }

  test("short and empty docs score zero, never dropped") {
    val docs = Seq(
      (1L, "solo"),
      (2L, ""),
      (3L, "two tokens")).toDF("doc_id", "text")
    val r = LangModel.bigramScore(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(3)))
    assert(r.length === 3)
    assert(r(0) === ((1L, 0L, 0L)))
    assert(r(1) === ((2L, 0L, 0L)))
    assert(r(2)._2 === 1L) // one bigram
  }

  test("mean is the integer floor of sum over count") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"(x2), "b a"
      (2L, "c d")).toDF("doc_id", "text")
    val rows = LangModel.bigramScore(docs).collect()
    val byId = rows.map(x =>
      x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    val (n, sum, avg) = byId(1L)
    assert(n === 3L)
    assert(avg === sum / n)
  }
}
