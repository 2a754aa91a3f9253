package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Profile
import graft.multimodal.Multimodal
import graft.pipeline.EntityResolution

class FsProfileImageSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ------------------------------------------- Fellegi–Sunter weights

  test("fs weights: m from seed pairs, u from histograms, exact log2 weight") {
    // one block (brand B1) with a single fuzzy match pair agreeing on
    // type+size; two singleton blocks; prices all distinct
    val part = Seq(
      (1L, "widget alpha", "B1", "T1", 5, 10.0),
      (2L, "widget alphb", "B1", "T1", 5, 11.0),
      (3L, "gadget thing", "B2", "T2", 7, 12.0),
      (4L, "gizmo object", "B3", "T9", 8, 13.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val out = EntityResolution.fsWeights(part)
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // u_den = 4*3 = 12 for every field
    assert(out.values.forall(_._5 === 12L))
    // p_type: T1 twice -> u_num = 2; m = 1/1; w = log2(12/2) = log2 6
    val t = out("p_type")
    assert(t._2 === 1L && t._3 === 1L && t._4 === 2L)
    assert(t._6.contains(math.floor(math.log(6.0) / math.log(2.0) * 1e3 + 0.5).toLong))
    // p_size: sizes 5,5,7,8 -> u_num = 2, same agreement
    assert(out("p_size")._4 === 2L && out("p_size")._3 === 1L)
    // p_retailprice: all distinct -> u_num = 0 -> NULL weight
    val p = out("p_retailprice")
    assert(p._4 === 0L && p._6.isEmpty)
  }

  // --------------------------------------------------- profile drift

  test("profile diff: exact null/distinct/rowcount deltas per column") {
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("k", "v")
    val next = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, Some("c")))
      .toDF("k", "v")
    val out = Profile.profileDiff(base, next, Seq("k", "v"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("k") === (("k", 3L, 4L, 0L, 0L, 0L, 3L, 4L, 1L)))
    // v: nulls 1 -> 2 (+1), distinct a,b -> a,c (2 -> 2, delta 0)
    assert(out("v") === (("v", 3L, 4L, 1L, 2L, 1L, 2L, 2L, 0L)))
  }

  // ------------------------------------------------ image aHash dedup

  /** Independent reimplementation of the aHash from the generating
    * formula — what the DuckDB oracle does, here as the differential
    * twin for the PNG round-trip path. */
  private def formulaHash(id: Long): (Long, Long) = {
    val px = Array.tabulate(16, 16) { (y, x) =>
      val v = Multimodal.synthPixel(id / 2, x, y)
      if (id % 2 == 1 && x == 0 && y == 0) (v + 8) % 256 else v
    }
    val bs = new Array[Long](64)
    for (y <- 0 until 16; x <- 0 until 16)
      bs((y / 2) * 8 + x / 2) += px(y)(x)
    val total = bs.sum
    var w0 = 0L; var w1 = 0L
    for (b <- 0 until 64 if bs(b) * 64 > total)
      if (b < 32) w0 |= 1L << b else w1 |= 1L << (b - 32)
    (w0, w1)
  }

  test("image ahash: PNG encode->decode hash equals the formula hash") {
    val docs = (0L until 10L).toDF("doc_id")
    val got = Multimodal.imageAHashes(Multimodal.packSyntheticPngs(docs))
      .collect().map(h => h.media_id -> ((h.w0, h.w1))).toMap
    assert(got.size === 10)
    (0L until 10L).foreach { id =>
      assert(got(id) === formulaHash(id), s"media $id")
    }
  }

  test("image ahash: near-dup pairs match the brute-force formula pairs") {
    val n = 24L
    val docs = (0L until n).toDF("doc_id")
    val got = Multimodal.nearDupImagePairs(
        Multimodal.imageAHashes(Multimodal.packSyntheticPngs(docs)).toDF())
      .as[(Long, Long, Int)].collect().toSet
    val hashes = (0L until n).map(id => id -> formulaHash(id)).toMap
    val brute = (for {
      a <- 0L until n; b <- (a + 1) until n
      h = java.lang.Long.bitCount(hashes(a)._1 ^ hashes(b)._1) +
        java.lang.Long.bitCount(hashes(a)._2 ^ hashes(b)._2)
      if h <= 3
    } yield (a, b, h)).toSet
    assert(got === brute)
    // the planted sibling perturbation is one pixel: expect at least
    // half the sibling pairs inside the radius
    val siblings = brute.count { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(siblings >= (n / 2 / 2).toInt, s"only $siblings sibling pairs")
  }
}
