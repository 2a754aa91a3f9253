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

  test("curate on the fixture corpus: deterministic, monotone shrinking") {
    val docs = Tables.documents(spark, sfDir)
    val out1 = Curation.curate(docs).cache()
    assert(out1.count() > 0 && out1.count() <= docs.count())
    val out2 = Curation.curate(docs)
    assert(out1.exceptAll(out2).isEmpty && out2.exceptAll(out1).isEmpty)
    out1.unpersist()
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
