package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Repeated-span dedup: planted duplicated runs are detected, unique text
  * is not, short docs participate as whole-doc spans.
  */
class SpanDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared >=k-token run lights up spans in both docs, unique text in neither") {
    val shared = words("dup", 20) // 20-token run shared verbatim
    val docs = Seq(
      (1L, words("a", 30) + " " + shared),
      (2L, shared + " " + words("b", 30)),
      (3L, words("c", 60))
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, spanTokens = 15)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a 20-token shared run contains 20-15+1 = 6 duplicated 15-windows
    assert(out(1L)._2 === 6L, s"doc 1 dup spans: ${out(1L)}")
    assert(out(2L)._2 === 6L, s"doc 2 dup spans: ${out(2L)}")
    assert(out(3L)._2 === 0L, s"unique doc must have zero dup spans: ${out(3L)}")
    // doc 1: 50 tokens → 36 windows, all distinct
    assert(out(1L)._1 === 36L)
    spark.catalog.clearCache()
  }

  test("short documents participate as whole-doc exact-dup candidates") {
    val docs = Seq(
      (1L, "tiny duplicate doc"),
      (2L, "tiny duplicate doc"),
      (3L, "another tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, spanTokens = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 0L)
    spark.catalog.clearCache()
  }

  test("dup_span_frac is n_dup/n_spans") {
    val docs = Seq(
      (1L, words("x", 15) + " " + words("y", 15)),
      (2L, words("x", 15) + " " + words("z", 15))
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicatedSpans(docs, spanTokens = 15).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) === r.getLong(2).toDouble / r.getLong(1))
    }
    spark.catalog.clearCache()
  }
}
