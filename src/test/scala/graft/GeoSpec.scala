package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Geo

/** The grid radius join must produce exactly the cross-join-with-
  * predicate pair set: boundary distances (dist² == r² inclusive),
  * same-cell and diagonal-neighbor pairs, duplicates at one point, and
  * random corpora. Each pair must appear exactly once. */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(ls: Seq[(Long, Long, Long)],
      rs: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    for {
      (lk, lx, ly) <- ls.toSet
      (rk, rx, ry) <- rs.toSet
      d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
      if d2 <= r * r
    } yield (lk, rk, d2)

  private def run(ls: Seq[(Long, Long, Long)],
      rs: Seq[(Long, Long, Long)], r: Long): Seq[(Long, Long, Long)] =
    Geo.gridRadiusJoin(ls.toDF("lk", "x", "y"), rs.toDF("rk", "x", "y"),
        "x", "y", r)
      .collect().map(rr => (rr.getLong(0), rr.getLong(1), rr.getLong(2)))
      .toSeq

  test("boundary, same-cell, diagonal and far pairs") {
    val ls = Seq[(Long, Long, Long)](
      (1, 100, 100),   // same cell as rk=10
      (2, 95, 5),      // cell (0,0) edge; rk=11 at (105,5) is cell (1,0)
      (3, 0, 0),       // exactly r away from rk=12 (inclusive)
      (4, 5000, 5000)) // far from everything
    val rs = Seq[(Long, Long, Long)](
      (10, 120, 130), (11, 105, 5), (12, 0, 100), (13, 9999, 9999))
    val r = 100L
    val got = run(ls, rs, r)
    assert(got.toSet == brute(ls, rs, r))
    assert(got.size == got.toSet.size, "each pair exactly once")
    assert(got.toSet.contains((3L, 12L, 10000L)), "r² boundary inclusive")
  }

  test("duplicate points all pair up") {
    val ls = Seq[(Long, Long, Long)]((1, 50, 50), (2, 50, 50))
    val rs = Seq[(Long, Long, Long)]((10, 50, 50), (11, 60, 50))
    val got = run(ls, rs, 20L)
    assert(got.toSet == brute(ls, rs, 20L))
    assert(got.size == 4)
  }

  test("random corpora match brute force at several radii") {
    val rnd = new scala.util.Random(7)
    val ls = (1L to 200L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val rs = (1L to 200L).map(i =>
      (i + 1000, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    for (r <- Seq(1L, 37L, 250L)) {
      val got = run(ls, rs, r)
      assert(got.toSet == brute(ls, rs, r), s"r=$r")
      assert(got.size == got.toSet.size, s"r=$r dup pairs")
    }
  }
}
