package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Betweenness

class BetweennessSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("path graph, single landmark: Brandes deltas in nanos") {
    // path 1-2-3-4-5, landmark = node 2 (degree tie broken node asc).
    // From 2: sigma all 1; delta(4) = 1 (pair 2-5 via 4), delta(3) = 2
    // (pairs 2-4, 2-5), delta(1) = 0 (leaf).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = Betweenness.landmarkBetweenness(path, "u", "v",
      nLandmarks = 1, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 2000000000L, 4L -> 1000000000L))
  }

  test("diamond: two equal shortest paths split the dependency") {
    // 1-2, 1-3, 2-4, 3-4, 4-5; landmark = node 4 (degree 3).
    // sigma(1) = 2 via {2,3}; delta(2) = delta(3) = (1/2)·(1+0) = 0.5
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Betweenness.landmarkBetweenness(g, "u", "v",
      nLandmarks = 1, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 500000000L, 3L -> 500000000L))
  }

  test("two landmarks accumulate dependencies") {
    // path 1-2-3-4-5, landmarks {2, 3}: from 2 -> delta(3)=2, delta(4)=1;
    // from 3 -> delta(2)=1 (pair 3-1), delta(4)=1 (pair 3-5)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = Betweenness.landmarkBetweenness(path, "u", "v",
      nLandmarks = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      2L -> 1000000000L, 3L -> 2000000000L, 4L -> 2000000000L))
  }
}
