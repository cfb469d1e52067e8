package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.Tables

/** Property tests (SURVEY.md §5.3): fragmentation transparency and
  * optimization invariance over random reference-shaped predicates.
  * (scalatest+scalacheck bridge isn't in the offline cache, so cases are
  * drawn directly from Gen with a fixed seed.) */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def init(): Unit = Tables.register(spark, TestSpark.sfDir)

  private def samples(g: Gen[Double], n: Int): Seq[Double] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("fragmentation transparency: orders_f ≡ orders under any filter") {
    init()
    samples(Gen.choose(0.0, 500000.0), 8).foreach { t =>
      val a = spark.table("orders").filter(col("o_totalprice") > t).count()
      val b = spark.table("orders_f").filter(col("o_totalprice") > t).count()
      assert(a === b, s"threshold $t")
    }
  }

  test("vertical transparency: customer_f ≡ customer under any filter") {
    init()
    samples(Gen.choose(-1000.0, 10000.0), 8).foreach { t =>
      val a = spark.table("customer").filter(col("c_acctbal") > t).count()
      val b = spark.table("customer_f").filter(col("c_acctbal") > t).count()
      assert(a === b, s"threshold $t")
    }
  }

  test("optimizer invariance: pushdown does not change join results") {
    init()
    samples(Gen.choose(0.0, 500000.0), 5).foreach { t =>
      val q =
        s"""SELECT c.c_custkey, o.o_orderkey FROM customer_f c
           |JOIN orders_f o ON c.c_custkey = o.o_custkey
           |WHERE o.o_totalprice > $t""".stripMargin
      val fragmented = spark.sql(q).count()
      val base = spark.sql(q.replace("customer_f", "customer")
        .replace("orders_f", "orders")).count()
      assert(fragmented === base, s"threshold $t")
    }
  }
}
