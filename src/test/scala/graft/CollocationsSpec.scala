package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Collocations

class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a true collocation outranks frequent-but-independent pairs") {
    // 'new york' always co-occurs; 'the' is everywhere (high count,
    // no association); filler words pad the denominator
    val docs = (0 until 10).map { i =>
      (i.toLong, s"the city of new york is the place f$i visited again")
    }.toDF("doc_id", "text")
    val r = Collocations.topBigramsByLift(docs, k = 5, minCount = 5)
      .collect()
    assert(r.nonEmpty)
    val byBigram = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(2))).toMap
    assert(byBigram.contains("new york"))
    val ny = byBigram("new york")
    assert(ny._1 === 10L)
    // 'the city' (the appears 2x per doc, city 1x) must score below
    // the perfect pair
    byBigram.get("the city").foreach { tc =>
      assert(tc._2 < ny._2)
    }
    // the top entry by lift is one of the always-together pairs
    assert(r.head.getLong(2) >= ny._2)
  }

  test("minCount prunes the rare tail before scoring") {
    val docs = Seq(
      (1L, "rare pair appears once"),
      (2L, "common duo common duo common duo common duo common duo"))
      .toDF("doc_id", "text")
    val r = Collocations.topBigramsByLift(docs, k = 10, minCount = 5)
      .collect().map(_.getString(0)).toSet
    assert(!r.contains("rare pair"))
    assert(r.contains("common duo"))
  }
}
