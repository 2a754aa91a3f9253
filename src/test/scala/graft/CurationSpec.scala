package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.pipeline.Curation

class CurationSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("curate: planted junk, exact dupes, and near-dupes are all removed") {
    val base = "the data pipeline reads parquet files and aggregates daily " +
      "metrics for every customer region then writes results back to storage " +
      "with a clean schema and stable partitioning for downstream consumers"
    val fixture = Seq(
      (1L, base, "srcA"),
      (2L, base, "srcA"),                                  // exact dup of 1
      (3L, base.replace("daily", "weekly"), "srcB"),       // near dup of 1
      (4L, "a b", "srcB"),                                 // too short → low quality
      (5L, "completely different content about cooking pasta with tomato sauce and fresh basil leaves in a large copper pot on a warm evening", "srcB")
    ).toDF("doc_id", "text", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))

    val got = Curation.curate(fixture, minQuality = 0.15, nearDupThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 5L))
  }

  test("curateMultimodal: one manifest row per doc, flags match the modality loser sets") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val manifest = Curation.curateMultimodal(docs).cache()
    assert(manifest.columns.toSeq ===
      Seq("doc_id", "dup_text", "dup_image", "dup_audio", "dup_video", "keep"))
    assert(manifest.count() === docs.count(), "one row per document")
    // keep is exactly the negation of any-dup
    assert(manifest.filter(
      col("keep") =!= (org.apache.spark.sql.functions.lit(1) -
        org.apache.spark.sql.functions.greatest(col("dup_text"),
          col("dup_image"), col("dup_audio"), col("dup_video")))).isEmpty)
    // the image flag set IS the image-leg loser set (differential vs the
    // standalone operator — same convention for the other modalities)
    import graft.multimodal.Multimodal
    val expectedImg = Multimodal.nearDupImagePairs(
        Multimodal.imageAHashes(Multimodal.packSyntheticPngs(docs)).toDF())
      .select(col("id_b")).as[Long].collect().toSet
    val gotImg = manifest.filter(col("dup_image") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(gotImg === expectedImg)
    // the planted odd-sibling media structure must surface SOME losers,
    // and at least one clean doc must survive
    assert(gotImg.nonEmpty, "planted image near-dups found")
    assert(manifest.filter(col("keep") === 1).count() > 0)
    manifest.unpersist()
    spark.catalog.clearCache()
  }

  test("curate on the fixture corpus: deterministic, monotone shrinking") {
    val docs = Tables.documents(spark, sfDir)
    val out1 = Curation.curate(docs).cache()
    assert(out1.count() > 0 && out1.count() <= docs.count())
    val out2 = Curation.curate(docs)
    assert(out1.exceptAll(out2).isEmpty && out2.exceptAll(out1).isEmpty)
    out1.unpersist()
  }

  test("injected exactPre reproduces curate AND prepareCorpus default outputs") {
    // the round-13 session-memo path: ONE checkpointed quality+exact-dedup
    // prefix feeds both composites; outputs must equal the self-built path
    val docs = Tables.documents(spark, sfDir)
    val shared = graft.Caching.checkpointed(Curation.exactDedupedQuality(docs))
    val cInj = Curation.curate(docs, exactPre = Some(shared))
      .collect().map(_.toSeq).toSet
    val cDef = Curation.curate(docs).collect().map(_.toSeq).toSet
    assert(cInj === cDef)
    val pInj = Curation.prepareCorpus(docs, exactPre = Some(shared))
      .collect().map(_.toSeq).toSet
    val pDef = Curation.prepareCorpus(docs).collect().map(_.toSeq).toSet
    assert(pInj === pDef)
    // gates and exactPre are mutually exclusive (the prefix skips them)
    intercept[IllegalArgumentException] {
      Curation.curate(docs, langAllow = Seq("en"), exactPre = Some(shared))
    }
    graft.Caching.releaseCheckpoint(shared)
    spark.catalog.clearCache()
  }

  test("curate langAllow gate: output equals curation of the pre-filtered corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sfDir)
    val gated = graft.pipeline.Curation.curate(docs, langAllow = Seq("en"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pre = docs.join(
      graft.text.TextOps.langId(docs).filter(col("lang_pred") === "en").select("doc_id"),
      "doc_id")
    val expected = graft.pipeline.Curation.curate(pre)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated.nonEmpty && gated === expected)
    spark.catalog.clearCache()
  }

  test("curate repetitionGate: output equals curation of the repetition-kept corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sfDir)
    val gated = graft.pipeline.Curation.curate(docs, repetitionGate = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pre = docs.join(
      graft.text.TextOps.repetition(docs).filter(col("repetition_keep")).select("doc_id"),
      "doc_id")
    val expected = graft.pipeline.Curation.curate(pre)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated.nonEmpty && gated === expected)
    spark.catalog.clearCache()
  }
}
