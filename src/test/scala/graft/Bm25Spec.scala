package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bm25

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("n_chars",
      org.apache.spark.sql.functions.length($"text").cast("long"))

  test("rare shared terms outrank common shared terms") {
    // query doc 0 shares the rare "zebra" with doc 10, only the ubiquitous
    // "the" with doc 11; every other doc also has "the" (making it cheap)
    val corpus = docs(Seq(
      0L -> "the zebra runs",
      10L -> "the zebra sleeps well today",
      11L -> "the cat sleeps on a mat") ++
      (20L to 30L).map(i => i -> "the quick brown fox jumps"): _*)
    val ranked = Bm25.topK(corpus, k = 3, nQueries = 1)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(ranked(10L) === 1, s"zebra doc must rank first: $ranked")
  }

  test("scores are exact micro-unit sums: deterministic across partitioning") {
    val base = (1L to 200L).map(i =>
      i -> s"token${i % 7} token${i % 11} token${i % 13} filler common words")
    val a = Bm25.topK(docs(base: _*), k = 5, nQueries = 5)
      .select("query_id", "doc_id", "score_micro")
      .as[(Long, Long, Long)].collect().toSet
    val shuffled = docs(base: _*).repartition(17)
    val b = Bm25.topK(shuffled, k = 5, nQueries = 5)
      .select("query_id", "doc_id", "score_micro")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("higher tf of a query term scores higher, all else equal") {
    val corpus = docs(
      0L -> "apple orchard",
      10L -> "apple apple apple banana pear plum",
      11L -> "apple banana pear plum kiwi fig")
    val scores = Bm25.topK(corpus, k = 5, nQueries = 1)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(scores(10L) > scores(11L))
  }

  test("unigram LM: common-token docs outscore rare-token docs; empties kept") {
    val corpus = docs(
      1L -> "the the the the",     // all high-probability tokens
      2L -> "xylo qwer zxcv bnml", // all hapax legomena
      3L -> "")
    val got = Bm25.unigramLogprob(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got(1L)._2 > got(2L)._2, s"common tokens must score higher: $got")
    assert(got(3L) === ((0L, 0.0)))
    // avg_logprob is a probability log: strictly negative for real docs
    assert(got(1L)._2 < 0.0 && got(2L)._2 < 0.0)
  }

  test("unigram LM scores are partition-invariant (exact micro sums)") {
    val base = (1L to 300L).map(i => i -> s"w${i % 12} w${i % 5} w${i % 3} tail")
    val a = Bm25.unigramLogprob(docs(base: _*))
      .select("doc_id", "lp_sum_micro").as[(Long, Long)].collect().toSet
    val b = Bm25.unigramLogprob(docs(base: _*).repartition(17))
      .select("doc_id", "lp_sum_micro").as[(Long, Long)].collect().toSet
    assert(a === b && a.nonEmpty)
  }
}
