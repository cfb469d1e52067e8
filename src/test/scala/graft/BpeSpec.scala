package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference BPE (Sennrich merge_vocab): same counting,
    * same (count desc, pair desc) tie-break, same left-to-right
    * non-overlapping fold. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : Seq[(String, Long)] = {
    var vocab = words.map { case (w, f) =>
      w.toSeq.map(_.toString).toList -> f }.toSeq
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; Seq(a, b) <- syms.sliding(2)
           if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      val ((a, b), c) = counts.toSeq
        .maxBy { case ((a, b), c) => (c, s"$a $b") }
      vocab = vocab.map { case (syms, f) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList -> f
      }
      (s"$a $b", c)
    }
  }

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("3 learned merges equal the sequential reference on a corpus " +
      "where string-replace would under-merge (banana)") {
    val docs = docsOf("banana banana banana bandana", "ana banana")
    val words = Map("banana" -> 4L, "bandana" -> 1L, "ana" -> 1L)
    val want = refTrain(words, 3)
    val got = Bpe.train(docs, 3).orderBy("round").collect()
      .map(x => (x.getString(1), x.getLong(2)))
    assert(got.toSeq === want)
  }

  test("merge application folds left-to-right non-overlapping") {
    val docs = docsOf("aaaa aaa")
    // round 1 merges (a,a): "aaaa" -> [aa, aa], "aaa" -> [aa, a]
    val st = Bpe.symbolState(docs, 1).orderBy("tok").collect()
      .map(x => (x.getString(0), x.getString(2)))
    assert(st.toSeq === Seq(("aaa", "aa a"), ("aaaa", "aa aa")))
  }

  test("ties break on the lexicographically largest pair") {
    // every adjacent pair occurs exactly once: argmax is pair-desc
    val docs = docsOf("ab cd")
    val got = Bpe.train(docs, 1).collect()(0)
    assert(got.getString(1) === "c d" && got.getLong(2) === 1L)
  }
}
