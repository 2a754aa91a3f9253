package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Perceptual audio fingerprints: codec round-trip exactness against a
  * formula-computed reference, planted near-dup recovery through the
  * shared banded Hamming join, and the quarantine paths.
  */
class AudioFpSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 200
  private def docsDf = (0L until N).map(Tuple1(_)).toDF("doc_id")

  /** Formula-direct fingerprint — no codec. */
  private def referenceFp(id: Long): (Long, Long) = {
    val s = Multimodal.synthPcmPair(id).map(_.toInt)
    val n = s.length
    val e = new Array[Long](32); val z = new Array[Long](32)
    for (i <- 0 until n) {
      val w = (i * 32) / n
      e(w) += s(i).toLong * s(i)
      if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) z(w) += 1
    }
    val te = e.sum; val tz = z.sum
    var w0 = 0L; var w1 = 0L
    for (w <- 0 until 32) {
      if (e(w) * 32 > te) w0 |= 1L << w
      if (z(w) * 32 > tz) w1 |= 1L << w
    }
    (w0, w1)
  }

  test("decoded fingerprints equal the formula reference (lossless round trip)") {
    val got = Multimodal.audioFingerprints(
        Multimodal.packSyntheticNearDupWavs(docsDf))
      .collect().map(f => f.media_id -> ((f.w0, f.w1))).toMap
    assert(got.size === N)
    (0L until N).foreach { id =>
      assert(got(id) === referenceFp(id), s"id=$id")
    }
    spark.catalog.clearCache()
  }

  test("planted sibling pairs are recovered by the banded join") {
    val pairs = Multimodal.nearDupImagePairs(
        Multimodal.audioFingerprints(
          Multimodal.packSyntheticNearDupWavs(docsDf)).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until N by 2).map(a => (a, a + 1)).toSet
    val recall = (pairs & planted).size.toDouble / planted.size
    // observed 235/250 at sf0.001 (some siblings drift past radius 3)
    assert(recall >= 0.8, s"recall=$recall")
    spark.catalog.clearCache()
  }

  test("short and unparseable payloads are quarantined") {
    implicit val enc =
      org.apache.spark.sql.Encoders.product[Multimodal.AudioRecord]
    val bad = Seq(
      Multimodal.AudioRecord(1L,
        Multimodal.packWavBytes(Array.fill[Short](8)(100))), // < 32 samples
      Multimodal.AudioRecord(2L, Array[Byte](1, 2, 3, 4)))   // not a WAV
    val out = Multimodal.audioFingerprints(spark.createDataset(bad))
    assert(out.count() === 0)
    spark.catalog.clearCache()
  }
}
