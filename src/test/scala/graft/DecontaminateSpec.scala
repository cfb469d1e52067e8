package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val benchQ = "what is the capital of france and where is it"
  private lazy val eval = Seq((100L, benchQ)).toDF("doc_id", "text")

  private lazy val train = Seq(
    // verbatim leak of the benchmark question inside a longer doc
    (1L, "trivia night answers: " + benchQ + " plus other questions"),
    // shares only the sub-threshold bigram "the capital" — clean at n=3
    (2L, "the capital expense budget was approved by the board"),
    (3L, "completely unrelated text about spark shuffle partitions"),
    // shorter than n tokens: whole-text fallback gram, no match
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  test("verbatim leak is flagged, overlap below n is not") {
    val r = Decontaminate.overlap(train, eval, n = 3).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val byId = r.map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(byId(1L) && !byId(2L) && !byId(3L) && !byId(4L))
    // the leaked question contributes every one of its 3-grams:
    // 10 tokens -> 8 shingles
    assert(r(0).getLong(1) === 8L)
    // clean docs still appear, with an explicit zero
    assert(r(2).getLong(1) === 0L)
  }

  test("minHits raises the flag threshold") {
    val r = Decontaminate.overlap(train, eval, n = 3, minHits = 9)
      .filter(col("doc_id") === 1L).collect()
    assert(r.head.getLong(1) === 8L && !r.head.getBoolean(2))
  }

  test("short eval doc decontaminates via whole-text fallback gram") {
    val shortEval = Seq((200L, "tiny doc")).toDF("doc_id", "text")
    val r = Decontaminate.overlap(train, shortEval, n = 3)
      .filter(col("doc_id") === 4L).collect()
    assert(r.head.getBoolean(2))
  }

  test("common-gram coverage flags the boilerplate doc") {
    val footer = "subscribe to our newsletter for updates today"
    // 6-token unique prefixes: 13 tokens -> 11 grams, 5 of them the
    // shared footer's -> coverage 5/11 < 0.5 for the content docs
    val corpus = Seq(
      (1L, "alpha beta gamma delta aleph bet " + footer),
      (2L, "epsilon zeta eta theta gimel dalet " + footer),
      (3L, "iota kappa lambda mu he vav " + footer),
      (4L, footer), // pure boilerplate
      (5L, "nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    val r = Decontaminate.commonGramCoverage(corpus, n = 3, minDf = 4,
      boilerplateFrac = 0.5).collect()
    val byId = r.map(x => x.getLong(0) ->
      (x.getLong(2), x.getBoolean(4))).toMap
    // the footer contributes 5 shared 3-grams; doc 4 is nothing else
    assert(byId(4L)._1 === 5L && byId(4L)._2)
    assert(!byId(1L)._2 && byId(1L)._1 === 5L)
    assert(byId(5L) === ((0L, false)))
  }

  test("eval gram set is broadcast — train side joins without shuffling to discover hits") {
    val plan = Decontaminate.overlap(train, eval, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
