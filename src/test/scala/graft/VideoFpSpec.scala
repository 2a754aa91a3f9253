package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Perceptual video fingerprints: GIF demux round-trip exactness
  * against a formula-computed reference, planted sibling recovery, and
  * the quarantine path.
  */
class VideoFpSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 120
  private def docsDf = (0L until N).map(Tuple1(_)).toDF("doc_id")

  /** Formula-direct fingerprint — no codec. */
  private def referenceFp(id: Long): (Long, Long) = {
    val frames = Multimodal.synthFramesPair(id)
    var w0 = 0L; var w1 = 0L
    for (f <- 0 until math.min(frames.length, 4)) {
      val img = frames(f)
      val (w, h) = (img.getWidth, img.getHeight)
      val bs = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        bs(((y * 4) / h) * 4 + (x * 4) / w) += img.getRaster.getSample(x, y, 0)
      val total = bs.sum
      for (b <- 0 until 16 if bs(b) * 16 > total) {
        val bit = f * 16 + b
        if (bit < 32) w0 |= 1L << bit else w1 |= 1L << (bit - 32)
      }
    }
    (w0, w1)
  }

  test("decoded fingerprints equal the frame-raster reference (lossless demux)") {
    val got = Multimodal.videoFingerprints(
        Multimodal.packSyntheticNearDupGifs(docsDf))
      .collect().map(f => f.media_id -> ((f.w0, f.w1))).toMap
    assert(got.size === N)
    (0L until N).foreach(id => assert(got(id) === referenceFp(id), s"id=$id"))
    spark.catalog.clearCache()
  }

  test("the banded join recovers exactly the planted sibling pairs") {
    val pairs = Multimodal.nearDupImagePairs(
        Multimodal.videoFingerprints(
          Multimodal.packSyntheticNearDupGifs(docsDf)).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until N by 2).map(a => (a, a + 1)).toSet
    assert((pairs & planted) === planted, "every planted pair recovered")
    // md5 row phases decorrelate bases: chance collisions are rare
    assert(pairs.size <= planted.size + 3, s"extras=${pairs.size - planted.size}")
    spark.catalog.clearCache()
  }

  test("undecodable payloads are quarantined") {
    implicit val enc =
      org.apache.spark.sql.Encoders.product[Multimodal.VideoRecord]
    val bad = Seq(Multimodal.VideoRecord(1L, Array[Byte](9, 9, 9)))
    assert(Multimodal.videoFingerprints(spark.createDataset(bad)).count() === 0)
    spark.catalog.clearCache()
  }
}
