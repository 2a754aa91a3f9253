package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** Skyline: equivalence with the brute-force dominance filter, tie
  * handling, and frontier invariants.
  */
class SkylineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet

  test("matches brute-force dominance on a deterministic point cloud") {
    // pseudorandom but reproducible points, with deliberate collisions
    val pts = (1L to 400L).map { i =>
      (i, (i * 37) % 97, (i * 61) % 89)
    }
    val out = Skyline.skyline2D(pts.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === brute(pts))
  }

  test("duplicate frontier points all survive; dominated ties die") {
    val pts = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L),  // tied frontier point, both live
      (3L, 10L, 5L),                    // same x, worse y → dominated
      (4L, 5L, 12L),                    // frontier (better y)
      (5L, 12L, 1L)                     // frontier (better x)
    ).toDF("id", "x", "y")
    val out = Skyline.skyline2D(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 4L, 5L))
  }

  test("frontier is an antichain: strictly decreasing y over increasing x") {
    val pts = (1L to 300L).map(i => (i, (i * 13) % 71, (i * 29) % 83))
    val out = Skyline.skyline2D(pts.toDF("id", "x", "y"), "x", "y")
      .select("x", "y").as[(Long, Long)].collect()
      .distinct.sortBy(_._1)
    out.sliding(2).foreach {
      case Array((x1, y1), (x2, y2)) =>
        assert(x1 < x2 && y1 > y2, s"not an antichain: ($x1,$y1) ($x2,$y2)")
      case _ =>
    }
  }
}
