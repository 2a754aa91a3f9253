package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Bfs

class BfsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("path graph: hop distances from the single hub are exact; bound respected") {
    // path 1—2—3—4—5 with extra edges making 3 the highest-degree hub:
    // 3—6, 3—7. Seeds(nSeeds=1) = node 3 (degree 4).
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L), (3L, 7L))
      .toDF("a", "b")
    val got = Bfs.hubDistances(g, "a", "b", nSeeds = 1, rounds = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(3L -> 0, 2L -> 1, 4L -> 1, 6L -> 1, 7L -> 1,
      1L -> 2, 5L -> 2))
  }

  test("rounds bound excludes farther nodes; revisits keep the min dist") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    // hub = 3 or 1 (degree 3 vs 3? degrees: 1→{2,3}=2, 2→{1,3}=2, 3→{2,4,1}=3)
    val got = Bfs.hubDistances(g, "a", "b", nSeeds = 1, rounds = 1)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(3L -> 0, 1L -> 1, 2L -> 1, 4L -> 1))
  }

  test("multi-seed: distance is the min over seeds; determinism") {
    val g = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("a", "b")
    val out = Bfs.hubDistances(g, "a", "b", nSeeds = 2, rounds = 3).cache()
    // degrees: 2→2, 3→2, 1→1, 4→1 → seeds {2, 3}; everything within 1 hop
    val got = out.as[(Long, Int)].collect().toMap
    assert(got === Map(2L -> 0, 3L -> 0, 1L -> 1, 4L -> 1))
    val again = Bfs.hubDistances(g, "a", "b", nSeeds = 2, rounds = 3)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }
}
