package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

/** The bucket-pruned skyline must equal the brute-force dominance
  * definition on every shape that stresses the prune: ties on either
  * criterion, full duplicates, a single-value min column (one bucket,
  * no prune), anti-correlated data (everything on the frontier), and
  * random corpora across bucket counts. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] =
    rows.filter { case (_, p, s) =>
      !rows.exists { case (_, dp, ds) =>
        dp <= p && ds >= s && (dp < p || ds > s)
      }
    }.toSet

  private def run(rows: Seq[(Long, Long, Long)], buckets: Int,
      singleSweepMax: Long = 100000): Set[(Long, Long, Long)] =
    Skyline.skyline2d(rows.toDF("id", "price", "size"), "price", "size",
        buckets, singleSweepMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("hand corpus with ties and duplicates, across bucket counts") {
    val rows = Seq[(Long, Long, Long)](
      (1, 100, 5), (2, 100, 9), (3, 100, 9),  // equal-price tie: both 9s
      (4, 50, 9),                              // dominates all price-100
      (5, 50, 3), (6, 40, 2), (7, 40, 2),     // full duplicates survive
      (8, 200, 9),                             // dominated (price worse)
      (9, 200, 12), (10, 30, 1))
    val want = brute(rows)
    for (b <- Seq(1, 2, 7, 1024))
      assert(run(rows, b) == want, s"buckets=$b")
  }

  test("single-value min column: one bucket, exact pass does the work") {
    val rows = Seq[(Long, Long, Long)]((1, 7, 1), (2, 7, 5), (3, 7, 5))
    assert(run(rows, 64) == brute(rows))
    assert(run(rows, 64).map(_._1) == Set(2L, 3L))
  }

  test("anti-correlated: the whole corpus is the frontier") {
    // size grows with price: every point wins on one axis, so the
    // frontier is the whole corpus (worst case for the prune)
    val rows = (1L to 50L).map(i => (i, i * 10, i * 10))
    assert(run(rows, 8) == rows.toSet)
  }

  test("adversarial all-frontier corpus at scale: no stage funnels " +
      "the candidate set into one partition") {
    // 20k anti-correlated rows — the ENTIRE corpus is the frontier, so
    // the bucket prune drops nothing and the exact pass sees everything.
    // singleSweepMax=0 forces the skew-gate into the decomposed sweep
    // (per-bucket windows over distinct values) — the plan shape the
    // gate picks when the MEASURED candidate bound is large — which
    // must both finish and return every row.
    val n = 20000L
    val rows = (1L to n).map(i => (i, i, i))
    val out = Skyline.skyline2d(
      rows.toDF("id", "price", "size"), "price", "size", 64,
      singleSweepMax = 0)
    assert(out.count() == n)
    // heavy duplication on one minCol value: the aggregate collapses
    // it before any window sort sees the duplicates
    val dup = (1L to 5000L).map(i => (i, 7L, i % 100)) ++
      Seq((9001L, 3L, 1L))
    val got = run(dup, 16, singleSweepMax = 0)
    assert(got == brute(dup))
  }

  test("skew gate: single-sweep and decomposed paths are equivalent") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val rows = (1L to 400L).map(i =>
        (i, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val want = brute(rows)
      assert(run(rows, 16, singleSweepMax = Long.MaxValue) == want,
        s"single-sweep trial=$trial")
      assert(run(rows, 16, singleSweepMax = 0) == want,
        s"decomposed trial=$trial")
    }
  }

  test("random corpora match brute force") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val rows = (1L to 300L).map(i =>
        (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      assert(run(rows, 16) == brute(rows), s"trial=$trial")
    }
  }
}
