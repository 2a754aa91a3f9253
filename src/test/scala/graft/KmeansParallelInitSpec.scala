package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.similarity.Ann

/** k-means|| seeding (Bahmani VLDB'12): structural invariants,
  * determinism, planted-cluster recovery, and the degenerate corpora a
  * seeding pass sees in practice. The cross-engine differential proof is
  * the DuckDB oracle (`ann_kmeanspp_init` replays rounds, margins and the
  * greedy recluster exactly).
  */
class KmeansParallelInitSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)

  test("returns k ranked seeds with positive attraction weights") {
    val out = Ann.kmeansParallelInit(emb, k = 4).collect()
    assert(out.length === 4)
    assert(out.map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3, 4))
    // seeds are distinct corpus points
    assert(out.map(_.getLong(1)).distinct.length === 4)
    // every point is attracted to SOME candidate; chosen seeds carry
    // their own attraction mass (>= 1: themselves)
    out.foreach(r => assert(r.getLong(2) >= 1L, s"weight must be >= 1: $r"))
    spark.catalog.clearCache()
  }

  test("deterministic: two runs produce identical seed sets") {
    val a = Ann.kmeansParallelInit(emb, k = 4).collect().map(_.toSeq).toSeq
    val b = Ann.kmeansParallelInit(emb, k = 4).collect().map(_.toSeq).toSeq
    assert(a === b)
    spark.catalog.clearCache()
  }

  test("planted clusters: seeds spread across the clusters, not one") {
    // 3 tight clusters far apart; k=3 seeding must pick one seed in each
    // (farthest-point recluster can't pick two seeds 0.01 apart while a
    // cluster 10 away holds a third of the mass)
    val rnd = new scala.util.Random(11)
    val dim = 64
    val centers = Seq.tabulate(3)(c => Array.tabulate(dim)(i =>
      if (i % 3 == c) 10.0f else 0.0f))
    val rows = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 20).map { j =>
        ((ci * 20 + j).toLong,
          c.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      }
    }
    val seeds = Ann.kmeansParallelInit(rows.toDF("vec_id", "embedding"),
      k = 3, ell = 4, rounds = 3).collect()
    assert(seeds.length === 3)
    val clustersHit = seeds.map(_.getLong(1) / 20).distinct
    assert(clustersHit.length === 3,
      s"seeds collapsed into ${clustersHit.length} cluster(s): ${seeds.mkString(", ")}")
    spark.catalog.clearCache()
  }

  test("all-identical corpus: phi is 0 after the first seed, one row out") {
    val same = (1L to 9L).map(i => (i, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val out = Ann.kmeansParallelInit(same, k = 4).collect()
    assert(out.length === 1, s"expected the single possible seed: ${out.toSeq}")
    assert(out.head.getInt(0) === 1)
    assert(out.head.getLong(2) === 9L) // all mass on the one candidate
    spark.catalog.clearCache()
  }

  test("empty corpus returns an empty, correctly-shaped result") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Ann.kmeansParallelInit(empty, k = 4)
    assert(out.columns.toSeq === Seq("seed_rank", "vec_id", "weight"))
    assert(out.isEmpty)
    spark.catalog.clearCache()
  }
}
