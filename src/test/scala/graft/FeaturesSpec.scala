package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Features
import graft.functions.VectorFunctions

class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fnvRef(s: String): Long = {
    var h = 0xcbf29ce484222325L
    for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      { h ^= (b & 0xff).toLong; h *= 0x100000001b3L }
    h
  }

  test("fnv1a64 matches the byte-level reference, incl. non-ASCII") {
    val inputs = Seq("", "a", "hello", "héllo", "日本語", "a b  c")
    val got = inputs.toDF("s")
      .select(VectorFunctions.fnv1a64(col("s"))).as[Long].collect()
    assert(got.toSeq === inputs.map(fnvRef))
  }

  test("hashed features: index in [0,dim), sign from hash top bit, " +
      "repeated tokens accumulate") {
    val dim = 64
    val docs = Seq((1L, "x x x"), (2L, "x y")).toDF("doc_id", "text")
    val r = Features.hashedTokenFeatures(docs, dim).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val hx = fnvRef("x"); val hy = fnvRef("y")
    def idx(h: Long) = ((h % dim) + dim) % dim
    def sgn(h: Long) = if (h < 0) -1L else 1L
    val expect = Seq(
      (1L, idx(hx), 3 * sgn(hx)),
      (2L, idx(hx), sgn(hx)),
      (2L, idx(hy), sgn(hy))).sortBy(t => (t._1, t._2))
    assert(r.sortBy(t => (t._1, t._2)).toSeq === expect)
    assert(r.forall(t => t._2 >= 0 && t._2 < dim))
  }

  test("opposite-sign collisions cancel and are dropped") {
    // find two tokens colliding on index with opposite signs
    val dim = 4
    val toks = (0 until 2000).map(i => s"t$i")
    val byIdx = toks.groupBy(t => ((fnvRef(t) % dim) + dim) % dim)
    val pair = byIdx.values.flatMap { ts =>
      val pos = ts.find(t => fnvRef(t) >= 0)
      val neg = ts.find(t => fnvRef(t) < 0)
      pos.zip(neg)
    }.head
    val docs = Seq((1L, s"${pair._1} ${pair._2}")).toDF("doc_id", "text")
    assert(Features.hashedTokenFeatures(docs, dim).count() === 0)
  }

  test("quantile bins: counts sum to rows, ranges nest, scaled " +
      "bounds span [0,1]") {
    graft.sources.Tables.register(spark, TestSpark.sfDir)
    val orders = spark.table("orders")
    val bins = Features.quantileBins(orders, "o_totalprice", 10)
      .orderBy("bucket").collect()
    assert(bins.map(_.getLong(1)).sum === orders.count())
    assert(bins.map(_.getLong(0)).forall(b => b >= 1 && b <= 10))
    // per-bucket ranges are disjoint and ordered
    val his = bins.map(_.getDouble(3)); val los = bins.map(_.getDouble(2))
    assert(los.zip(his).forall { case (l, h) => l <= h })
    assert(his.init.zip(los.tail).forall { case (h, l) => h <= l })
    assert(bins.head.getDouble(4) === 0.0) // min scales to 0
    assert(bins.last.getDouble(5) === 1.0) // max scales to 1
  }

  test("binning assigns boundary ties to one bucket (never splits)") {
    val df = Seq.fill(20)(5.0).appendedAll(Seq(1.0, 9.0)).toDF("x")
    val bins = Features.quantileBins(df, "x", 4).collect()
    // all the tied 5.0s land in a single bucket (with the 1.0, since
    // every cutpoint equals 5.0 and buckets are (c_i, c_{i+1}] ranges)
    val fives = bins.filter(r => r.getDouble(2) <= 5.0 && 5.0 <= r.getDouble(3))
    assert(fives.length === 1)
    assert(fives.head.getLong(1) === 21L)
  }
}
