package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesSketch.misra_gries
import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed synthetic stream: token i appears ~N/(i+1) times (zipf-ish),
  // vocabulary 1000 >> sketch capacity 32
  private lazy val stream: Seq[String] = (0 until 1000).flatMap { i =>
    Seq.fill(2000 / (i + 1))(f"tok$i%04d")
  }

  test("sketch never misses an item above the N/(capacity+1) bound") {
    val capacity = 32
    val df = stream.toDF("tok").repartition(7)
    val sketch = df.agg(misra_gries(col("tok"), capacity))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val surviving = sketch.map(_.getString(0)).toSet
    assert(sketch.size <= capacity)
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val mustSurvive = exact.filter(_._2 > n / (capacity + 1)).keySet
    assert(mustSurvive.nonEmpty)
    assert(mustSurvive.subsetOf(surviving),
      s"missing: ${mustSurvive -- surviving}")
  }

  test("update path alone keeps at most `capacity` counters — the " +
      "partial buffer that ships in the shuffle is the bounded state") {
    // regression: a get-vs-null check on a primitive-Long map made
    // every miss look "seen", so the capacity gate + decrement never
    // ran and partial state grew with the partition's vocabulary; the
    // merge-time shrink masked it from end-to-end observation
    import org.apache.spark.sql.catalyst.expressions.{BoundReference,
      GenericInternalRow}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.MisraGriesSketch(
      BoundReference(0, StringType, nullable = true), capacity = 16)
    val buf = expr.createAggregationBuffer()
    val row = new GenericInternalRow(1)
    (0 until 5000).foreach { i =>
      row.update(0, UTF8String.fromString(f"tok${i % 500}%04d"))
      expr.update(buf, row)
    }
    assert(buf.counts.size <= 16)
    assert(buf.counts.size > 0)
  }

  test("two-pass heavy hitters equals the naive exact top-k") {
    val docs = stream.grouped(97).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = HeavyHitters.topTokens(docs, k = 10, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(10)
    assert(got === want)
  }

  test("empty corpus and oversized tokens survive") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.topTokens(empty, k = 5, capacity = 8)
      .collect().isEmpty)
    // a single 100 KB "token" must round-trip the sketch's partial
    // buffer serialization (writeUTF would throw at 64 KB)
    val big = "x" * 100000
    val docs = Seq((1L, s"$big $big small"), (2L, s"$big small"))
      .toDF("doc_id", "text").repartition(3)
    val r = HeavyHitters.topTokens(docs, k = 2, capacity = 8)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r === Seq((big, 3L), ("small", 2L)))
  }

  test("estimates undercount by at most N/(capacity+1)") {
    val capacity = 16
    val df = stream.toDF("tok").repartition(5)
    val sketch = df.agg(misra_gries(col("tok"), capacity))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    sketch.foreach { r =>
      val (tok, est) = (r.getString(0), r.getLong(1))
      val truth = exact(tok)
      assert(est <= truth, s"$tok overestimated: $est > $truth")
      assert(truth - est <= n / (capacity + 1),
        s"$tok undercounted past the bound: $est vs $truth")
    }
  }
}
