package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.similarity.Ann
import graft.text.TextOps

/** Round-6 batch: readability scores, Matryoshka truncation recall,
  * centroid drift — hand-computed fixtures.
  */
class Round6cSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("readability: exact counts and the textbook Flesch formula") {
    // "Hello world. Bye!" → 3 whitespace words, 2 sentence-ender runs,
    // vowel runs lowercased: he(e)llo(o) wo(o)rld b(ye) → 4
    val docs = Seq((1L, "Hello world. Bye!", "s1"))
      .toDF("doc_id", "text", "source")
    val r = TextOps.readability(docs).collect().head
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 4L)
    val w = 3.0; val s = 2.0; val y = 4.0
    val flesch = math.floor((206.835 - 1.015 * (w / s) - 84.6 * (y / w)) * 1e6 + 0.5) / 1e6
    val fk = math.floor((0.39 * (w / s) + 11.8 * (y / w) - 15.59) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("flesch") == flesch)
    assert(r.getAs[Double]("fk_grade") == fk)
  }

  test("readability: unpunctuated docs floor at one sentence; empty at 0 words") {
    val docs = Seq((1L, "no enders here", "a"), (2L, "", "b"))
      .toDF("doc_id", "text", "source")
    val rows = TextOps.readability(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("a").getAs[Long]("n_sentences") == 1L)
    assert(rows("b").getAs[Long]("n_words") == 0L)
    assert(rows("b").isNullAt(rows("b").fieldIndex("flesch")))
  }

  private def embOf(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("matryoshkaRecall: full-width prefix is a perfect retriever") {
    val e = embOf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(1f, 0f, 0f, 2f), 0),
      (2L, Seq(0.5f, 0.5f, 0f, 0f), 0), (3L, Seq(0f, 1f, 0f, 0f), 0)))
    val r = Ann.matryoshkaRecall(e, dims = 4, k = 1, nQueries = 1).collect()
    assert(r.length == 1 && r.head.getAs[Double]("recall_at_1") == 1.0)
  }

  test("matryoshkaRecall: a prefix that reverses the ranking scores 0") {
    // full-dim top-1 of v0 is v2 (cos .707 beats v1's .447), but on the
    // first two dims v1 becomes exactly colinear (cos 1.0) and wins
    val e = embOf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(1f, 0f, 0f, 2f), 0),
      (2L, Seq(0.5f, 0.5f, 0f, 0f), 0)))
    val full = Ann.matryoshkaRecall(e, dims = 4, k = 1, nQueries = 1).collect().head
    val pre = Ann.matryoshkaRecall(e, dims = 2, k = 1, nQueries = 1).collect().head
    assert(full.getAs[Double]("recall_at_1") == 1.0)
    assert(pre.getAs[Int]("n_hit") == 0)
    assert(pre.getAs[Double]("recall_at_1") == 0.0)
  }

  test("centroidDrift: single label coincides with the corpus (cos 1)") {
    val e = embOf(Seq(
      (0L, Seq(1f, 2f, 0f, 0f), 7), (1L, Seq(1f, 2f, 0f, 0f), 7)))
    val r = Ann.centroidDrift(e).collect().head
    assert(r.getAs[Int]("label") == 7)
    assert(r.getAs[Long]("n_vecs") == 2L)
    assert(r.getAs[Double]("cos_to_corpus") == 1.0)
  }

  test("centroidDrift: 45-degree label against the diagonal corpus mean") {
    // label 0 mean [1,0], label 1 mean [0,1] → corpus mean [.5,.5]
    // cos(label0, corpus) = 1/√2 → fold6(0.70710678…) = 0.707107
    val e = embOf(Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 1)))
    val rows = Ann.centroidDrift(e).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("cos_to_corpus")).toMap
    assert(rows(0) == 0.707107 && rows(1) == 0.707107)
  }

  test("centroidDrift: a zero corpus centroid yields NULL, not NaN") {
    val e = embOf(Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(-1f, 0f), 1)))
    val rows = Ann.centroidDrift(e).collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("cos_to_corpus"))))
  }
}
