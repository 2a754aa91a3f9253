package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withRunningTotal matches a single-partition window prefix sum") {
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("id", "v")
      .repartition(8) // scatter the input so the range shuffle does real work
    val got = Packing.withRunningTotal(df, Seq("id"), "v", "prev")
      .select("id", "prev").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("prev",
        coalesce(sum("v").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "prev").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("running total is independent of input partitioning") {
    val base = (1L to 300L).map(i => (i, i * 3 % 11)).toDF("id", "v")
    val a = Packing.withRunningTotal(base.repartition(1), Seq("id"), "v", "prev")
      .select("id", "prev").as[(Long, Long)].collect().toMap
    val b = Packing.withRunningTotal(base.repartition(13), Seq("id"), "v", "prev")
      .select("id", "prev").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("withRunningTotal rejects non-long value columns and clashing names") {
    val df = Seq((1L, 2)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Packing.withRunningTotal(df, Seq("id"), "v", "prev") // v is INT
    }
    val ok = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Packing.withRunningTotal(ok, Seq("id"), "v", "v") // output name clash
    }
  }

  test("packSequences cuts the token tape at exact capacity boundaries") {
    // doc lengths chosen so doc 3 straddles the capacity-10 boundary
    val docs = Seq(
      (1L, "a b c d"),          // tokens 0..3
      (2L, "e f g"),            // tokens 4..6
      (3L, "h i j k l"),        // tokens 7..11 → spans packs 0/1
      (4L, ""),                 // zero tokens at offset 12
      (5L, "m n")               // tokens 12..13
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, capacity = 10)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_id", "pack_offset", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out === Array(
      (1L, 4L, 0L, 0L, false),
      (2L, 3L, 0L, 4L, false),
      (3L, 5L, 0L, 7L, true),
      (4L, 0L, 1L, 2L, false),
      (5L, 2L, 1L, 2L, false)))
  }

  test("prepareCorpus manifest is self-consistent with curate") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val curated = graft.pipeline.Curation.curate(docs)
    val prep = graft.pipeline.Curation.prepareCorpus(docs)
    val rows = prep.collect()
    assert(rows.length === curated.count())
    // boundary flag agrees with offset + length vs capacity
    val bad = prep.filter(
      (col("pack_offset") + col("n_tokens") > 2048) =!= col("spans_boundary"))
    assert(bad.count() === 0)
    // encoded sequence length equals the token count
    val lenBad = prep.filter(col("n_tokens") > 0 &&
      size(split(col("token_ids"), ",")) =!= col("n_tokens"))
    assert(lenBad.count() === 0)
    spark.catalog.clearCache()
  }

  test("packSequences conserves tokens: last doc's prev+n equals corpus total") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val out = Packing.packSequences(docs, capacity = 2048)
    val total = out.agg(sum("n_tokens")).as[Long].head()
    val lastEnd = out.orderBy(col("doc_id").desc).limit(1)
      .select(col("pack_id") * 2048 + col("pack_offset") + col("n_tokens"))
      .as[Long].head()
    assert(lastEnd === total)
  }
}
