package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private lazy val media = Multimodal.packSynthetic(Tables.documents(spark, sfDir))

  test("pack: one media row per document, payload bytes = text bytes (ascii)") {
    val docs = Tables.documents(spark, sfDir)
    assert(media.count() === docs.count())
    val bad = media.join(docs, media("media_id") === docs("doc_id"))
      .filter(org.apache.spark.sql.functions.length($"content") =!= $"n_chars")
      .count()
    assert(bad === 0)
  }

  test("decodeFeatures: deterministic, bounded entropy, full coverage") {
    val feats1 = Multimodal.decodeFeatures(media.as[MediaRecord]).cache()
    assert(feats1.count() === media.count())
    assert(feats1.filter($"byte_entropy" < 0 || $"byte_entropy" > 8).count() === 0)
    assert(feats1.filter($"byte_mean" < 0 || $"byte_mean" > 255).count() === 0)
    val feats2 = Multimodal.decodeFeatures(media.as[MediaRecord])
    assert(feats1.exceptAll(feats2).isEmpty)
    feats1.unpersist()
  }

  test("frameSample: first frame is the payload prefix, no empty frames") {
    val frames = Multimodal.frameSample(media, n = 4, frameBytes = 64).cache()
    assert(frames.filter($"frame_idx" < 0 || $"frame_idx" > 3).count() === 0)
    val first = frames.filter($"frame_idx" === 0)
      .join(media, Seq("media_id"))
      .filter($"frame_bytes" =!=
        org.apache.spark.sql.functions.expr("substring(content, 1, 64)"))
      .count()
    assert(first === 0)
    frames.unpersist()
  }

  test("resizeStub: output length is ceil(n/factor), dims scaled") {
    val out = Multimodal.resizeStub(media, factor = 4)
      .join(media.select($"media_id", org.apache.spark.sql.functions.length($"content").as("len")),
        Seq("media_id"))
    val bad = out.filter(
      org.apache.spark.sql.functions.length($"resized") =!=
        org.apache.spark.sql.functions.ceil($"len" / 4.0).cast("int")).count()
    assert(bad === 0)
  }
}
