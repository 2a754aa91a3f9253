package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics._

/** Round-13 optimization gate: every operator that accepts a
  * pre-symmetrized edge relation (`symmetric = true` — the session-shared
  * co-bought sym cache path) must produce output IDENTICAL to its
  * self-symmetrizing default on the same graph.
  */
class SymmetricFlagSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // two cliques + bridge + pendant: non-trivial degrees, triangles, hubs
  private lazy val half = {
    val cliqueA = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    (cliqueA ++ cliqueB ++ Seq((5L, 10L), (13L, 20L))).toDF("a", "b")
  }
  private lazy val sym = graft.Caching.checkpointed(
    half.union(half.select(col("b").as("a"), col("a").as("b"))))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("hubDistances: symmetric flag equals default") {
    assert(rows(Bfs.hubDistances(sym, "a", "b", symmetric = true))
      === rows(Bfs.hubDistances(half, "a", "b")))
  }

  test("kCore: symmetric flag equals default") {
    assert(rows(GraphStats.kCore(sym, "a", "b", symmetric = true))
      === rows(GraphStats.kCore(half, "a", "b")))
    spark.catalog.clearCache()
  }

  test("degreeAssortativity: symmetric flag equals default") {
    assert(rows(GraphStats.degreeAssortativity(sym, "a", "b", symmetric = true))
      === rows(GraphStats.degreeAssortativity(half, "a", "b")))
  }

  test("landmarkHarmonic: symmetric flag equals default") {
    assert(rows(Harmonic.landmarkHarmonic(sym, "a", "b", symmetric = true))
      === rows(Harmonic.landmarkHarmonic(half, "a", "b")))
  }

  test("landmarkBetweenness: symmetric flag equals default") {
    assert(rows(Betweenness.landmarkBetweenness(sym, "a", "b", symmetric = true))
      === rows(Betweenness.landmarkBetweenness(half, "a", "b")))
  }

  test("closenessTopK: symmetric flag equals default") {
    assert(rows(HyperAnf.closenessTopK(sym, "a", "b", symmetric = true))
      === rows(HyperAnf.closenessTopK(half, "a", "b")))
    spark.catalog.clearCache()
  }

  test("nfCurve: symmetric flag equals default") {
    assert(HyperAnf.nfCurve(sym, "a", "b", rounds = 3, symmetric = true)
      === HyperAnf.nfCurve(half, "a", "b", rounds = 3))
    spark.catalog.clearCache()
  }
}
