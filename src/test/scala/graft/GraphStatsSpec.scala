package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.GraphStats

class GraphStatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("kCore peels the pendant chain, keeps the clique") {
    // K4 on {1,2,3,4} plus a pendant path 4—5—6: one k=3 peel removes
    // 5 and 6 (degrees 2 and 1); round 2 re-checks and the clique
    // stabilizes with every degree exactly 3.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val got = GraphStats.kCore(g, "a", "b", k = 3, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore cascade: each round peels the next layer") {
    // path 1—2—3—4—5 at k=2: round 1 drops endpoints 1,5; round 2
    // drops 2,4 (now degree 1); round 3 drops 3 — empty 2-core.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r1 = GraphStats.kCore(path, "a", "b", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    val r3 = GraphStats.kCore(path, "a", "b", k = 2, rounds = 3)
    assert(r3.count() === 0)
  }

  test("assortativity: star is maximally disassortative, clique-ish mix positive-or-zero") {
    // star K1,3: every edge joins deg-3 hub to deg-1 leaf — all (dx,dy)
    // pairs are (3,1)/(1,3), a perfect anti-correlation: r = -1.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = GraphStats.degreeAssortativity(star, "a", "b")
      .as[(Long, Double)].collect().head
    assert(r._1 === 6L) // symmetrized edge count
    assert(math.abs(r._2 - (-1.0)) < 1e-9)
    // degree-regular graph (triangle): variance term is 0 -> guarded 0.0
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val r2 = GraphStats.degreeAssortativity(tri, "a", "b")
      .as[(Long, Double)].collect().head
    assert(r2 === ((6L, 0.0)))
  }

  test("kCore ignores duplicate and reversed input edges") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("a", "b")
    // triangle: every node degree 2, stable at k=2 for any rounds
    val got = GraphStats.kCore(g, "a", "b", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
