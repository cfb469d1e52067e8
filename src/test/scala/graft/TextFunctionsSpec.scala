package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)

  test("normalize collapses whitespace and lowercases") {
    assert(one(normalize(col("text")), "  Hello\t WORLD\n x ") ===
      "hello world x")
  }

  test("tokens drops empties; tokenCount counts words") {
    assert(one(tokenCount(col("text")), "a  b   c") === 3)
    assert(one(tokenCount(col("text")), "   ") === 0)
  }

  test("word shingles: k-grams, distinct, short-text fallback") {
    val sh = one(wordShingles(col("text"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = one(wordShingles(col("text"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short.toSet === Set("a b"))
  }

  test("word shingles: codegen'd expression matches the declarative " +
      "HOF formulation row for row, including null/empty/short edges") {
    // the exact Column formula WordShingles replaced — any semantic
    // drift (ordering, dedup, fallback, null mapping) fails here
    def oldForm(text: org.apache.spark.sql.Column, k: Int) = {
      val toks = tokens(text)
      array_distinct(
        when(size(toks) >= k,
          transform(sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
          .otherwise(array(concat_ws(" ", toks))))
    }
    val docs = Seq(
      "a b c d e", "A  b\tC", "one", "", "  ", "x y x y x y",
      "Mixed CASE tokens here", null,
      "repeat repeat repeat repeat", "a b", "tab\there and\nnewline")
      .toDF("text")
    for (k <- Seq(1, 2, 3, 5)) {
      val both = docs.select(
        wordShingles(col("text"), k).as("nu"),
        oldForm(col("text"), k).as("old")).collect()
      both.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"row $i k=$k")
      }
    }
  }

  test("word bigrams: codegen'd expression matches the declarative " +
      "HOF formulation row for row (instances, order, edges)") {
    def oldForm(text: org.apache.spark.sql.Column) = {
      val toks = tokens(text)
      when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))
    }
    val docs = Seq(
      "a b c d e", "A  b\tC", "one", "", "  ", "x y x y x y",
      null, "repeat repeat repeat", "a b", "tab\there and\nnewline")
      .toDF("text")
    val both = docs.select(
      wordBigrams(col("text")).as("nu"),
      oldForm(col("text")).as("old")).collect()
    both.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"row $i")
    }
  }

  test("top-token fraction: codegen'd expression matches the " +
      "declarative aggregate formulation row for row") {
    def oldForm(text: org.apache.spark.sql.Column) = {
      val toks = tokens(text)
      val top = aggregate(array_distinct(toks), lit(0),
        (acc, tk) => greatest(acc, size(filter(toks, x => x === tk))))
      when(size(toks) > 0,
        top.cast("double") / size(toks).cast("double")).otherwise(0.0)
    }
    val docs = Seq(
      "word word word word", "all distinct tokens here", "one",
      "", "  ", null, "a b a b b", "Mixed MIXED mixed case")
      .toDF("text")
    val both = docs.select(
      topTokenFrac(col("text")).as("nu"),
      oldForm(col("text")).as("old")).collect()
    both.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) === r.getDouble(1), s"row $i")
    }
  }

  test("char ngrams cover the normalized text") {
    val g = one(charNgrams(col("text"), 3), "abcd")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(g.toSet === Set("abc", "bcd"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one(fingerprint(col("text")), "Hello  World")
    val b = one(fingerprint(col("text")), "hello world")
    assert(a === b)
  }

  test("langId picks the dominant marker language") {
    assert(one(langId(col("text")), "el la de que y en los") === "es")
    assert(one(langId(col("text")), "the cat and the dog of it") === "en")
    assert(one(langId(col("text")), "der hund und die katze ist") === "de")
    assert(one(langId(col("text")), "zzz qqq xxx") === "und")
  }

  test("quality score is in [0,1] and ranks fluent text higher") {
    val fluent = one(qualityScore(col("text")),
      ("the quick brown fox jumps over the lazy dog and then " * 10))
      .asInstanceOf[Double]
    val noise = one(qualityScore(col("text")), "@@!! ## 1234 %%")
      .asInstanceOf[Double]
    assert(fluent > noise && fluent <= 1.0 && noise >= 0.0)
  }

  test("ratios handle empty input without dividing by zero") {
    assert(one(punctRatio(col("text")), "") === 0.0)
    assert(one(avgWordLen(col("text")), "") === 0.0)
    assert(one(stopwordRatio(col("text")), "") === 0.0)
  }

  private def pretoks(text: String): Seq[String] =
    one(bpePretokens(col("text")), text)
      .asInstanceOf[scala.collection.Seq[String]].toSeq

  test("bpe pretokens: contraction suffixes split off") {
    assert(pretoks("don't stop") === Seq("don", "'t", " stop"))
    assert(pretoks("we'll they've") ===
      Seq("we", "'ll", " they", "'ve"))
  }

  test("bpe pretokens: letter/digit/punct runs segment separately") {
    assert(pretoks("abc123def") === Seq("abc", "123", "def"))
    assert(pretoks("hello, world!!") ===
      Seq("hello", ",", " world", "!!"))
    assert(pretoks("v2.0-rc1") ===
      Seq("v", "2", ".", "0", "-", "rc", "1"))
  }

  test("bpe pretokens: whitespace runs are their own tokens") {
    assert(pretoks("a \n b") === Seq("a", " \n ", "b"))
    assert(pretoks("x\t\ty") === Seq("x", "\t\t", "y"))
    assert(pretoks("") === Seq.empty)
    assert(pretoks("   ") === Seq("   "))
  }

  test("bpe pretokens: every input character lands in exactly one token") {
    val samples = Seq("don't v2.0, stop!\nnew-line\t9 lives",
      "  leading and trailing  ", "CamelCase MiXeD 42x")
    samples.foreach { s => assert(pretoks(s).mkString === s) }
  }

  private def repetition(s: String): (Double, Double, Double) = {
    val r = Seq(s).toDF("t").select(
      distinctTokenFrac(col("t")),
      dupBigramFrac(col("t")),
      topTokenFrac(col("t"))).collect().head
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("repetition: degenerate loop scores high, natural text low") {
    val (df, bf, tf) = repetition("spam spam spam spam")
    assert(df === 0.25 && tf === 1.0)
    // 3 bigram instances, 1 distinct -> 2/3 duplicated
    assert(math.abs(bf - 2.0 / 3) < 1e-15)
    val (df2, bf2, tf2) = repetition("each word here appears once only")
    assert(df2 === 1.0 && bf2 === 0.0)
    assert(tf2 === 1.0 / 6)
  }

  test("token chunks: overlap, clamped tail, and edge documents") {
    def chunks(s: String, c: Int, o: Int): Seq[String] =
      one(tokenChunks(col("text"), c, o), s)
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    // 10 tokens, windows of 4 advancing by 2: starts 0,2,4,6 — the
    // ceil formula stops once the window reaches the end
    assert(chunks("a b c d e f g h i j", 4, 2) ===
      Seq("a b c d", "c d e f", "e f g h", "g h i j"))
    // 9 tokens: last window clamps short
    assert(chunks("a b c d e f g h i", 4, 2) ===
      Seq("a b c d", "c d e f", "e f g h", "g h i"))
    // shorter than one window: a single whole-text chunk
    assert(chunks("a b", 4, 2) === Seq("a b"))
    // no tokens: no chunks (not one empty chunk)
    assert(chunks("", 4, 2) === Seq.empty)
    // zero overlap tiles exactly
    assert(chunks("a b c d", 2, 0) === Seq("a b", "c d"))
  }

  test("repetition: empty and single-token edges yield zeros") {
    assert(repetition("") === ((0.0, 0.0, 0.0)))
    val (df, bf, tf) = repetition("solo")
    assert(df === 1.0 && bf === 0.0 && tf === 1.0)
  }

  test("canonicalUrl: every documented noise axis collapses, semantics survive") {
    def canon(u: String): String =
      Seq(u).toDF("u")
        .select(canonicalUrl(col("u")).as("c"))
        .collect()(0).getString(0)
    // the full noise stack at once
    assert(canon("HTTPS://www.EX3.Example.org:443/a/53/?id=3&utm_source=f#s") ===
      "ex3.example.org/a/53?id=3")
    // scheme spelling and http-vs-https both vanish
    assert(canon("http://ex1.example.org/a/9") === canon("HTTPS://ex1.example.org/a/9"))
    // default ports only: a real nonstandard port survives
    assert(canon("https://h.org:8080/x") === "h.org:8080/x")
    assert(canon("https://h.org:80/x") === "h.org/x")
    // utm first, middle, last — real params keep their order
    assert(canon("https://h.org/x?utm_a=1&id=2") === "h.org/x?id=2")
    assert(canon("https://h.org/x?id=2&utm_a=1&k=3") === "h.org/x?id=2&k=3")
    assert(canon("https://h.org/x?id=2&utm_a=1") === "h.org/x?id=2")
    // utm-only query vanishes entirely, with or without trailing slash
    assert(canon("https://h.org/x/?utm_a=1") === "h.org/x")
    assert(canon("https://h.org/x?utm_a=1") === "h.org/x")
    // path case is SIGNIFICANT (only host lowercases)
    assert(canon("https://H.org/Xy") === "h.org/Xy")
    // bare host, root slash
    assert(canon("https://www.h.org/") === "h.org")
    // already-canonical input is a fixpoint
    assert(canon("h.org/x?id=2") === "h.org/x?id=2")
  }
}
