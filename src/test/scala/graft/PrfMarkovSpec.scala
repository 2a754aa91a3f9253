package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Markov
import graft.text.Bm25

class PrfMarkovSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t) }.toDF("doc_id", "text")

  test("prf: expansion terms pull in docs the raw query cannot reach") {
    // query doc 0 shares "bridge" with doc 10; doc 10's distinctive
    // term "suspension" also lives in doc 11, which shares NOTHING with
    // the query — only the expanded query can retrieve doc 11.
    val d = docs(
      0L -> "bridge",
      10L -> "bridge suspension suspension",
      11L -> "suspension cable cable",
      12L -> "unrelated filler words entirely",
      13L -> "more unrelated filler prose")
    val base = Bm25.topK(d, k = 5, nQueries = 1)
      .as[(Long, Long, Long, Double, Int)].collect().map(_._2).toSet
    assert(base.contains(10L) && !base.contains(11L))
    val prf = Bm25.prfTopK(d, k = 5, fbDocs = 2, fbTerms = 2, nQueries = 1)
      .as[(Long, Long, Long, Int, Long)].collect()
    val prfDocs = prf.map(_._2).toSet
    assert(prfDocs.contains(11L), s"expanded retrieval missed doc 11: $prfDocs")
    // expanded term count: 1 original + at most 2 harvested
    assert(prf.map(_._5).distinct.forall(n => n >= 1L && n <= 3L))
  }

  test("prf: with fbTerms = 0 the ranking equals plain BM25") {
    val d = docs(
      0L -> "alpha beta",
      10L -> "alpha gamma gamma",
      11L -> "beta delta",
      12L -> "gamma delta epsilon")
    val plain = Bm25.topK(d, k = 3, nQueries = 1)
      .select("query_id", "doc_id", "score_micro", "rank")
      .collect().map(_.toString).sorted.toSeq
    val prf = Bm25.prfTopK(d, k = 3, fbDocs = 2, fbTerms = 0, nQueries = 1)
      .select("query_id", "doc_id", "score_micro", "rank")
      .collect().map(_.toString).sorted.toSeq
    assert(prf === plain)
  }

  private def events(rows: (Long, Long, String)*) =
    rows.zipWithIndex.map { case ((uid, sec, t), i) =>
      (i.toLong, new java.sql.Timestamp(sec * 1000L), uid, t)
    }.toDF("event_id", "ts", "user_id", "event_type")

  test("markov: alternating two-state chain settles at the uniform") {
    // every user strictly alternates a -> b -> a -> ... so P is the
    // 2-state swap matrix; pi = (1/2, 1/2) exactly, already from pi0
    val rows = (1L to 4L).flatMap(u =>
      (0L until 10L).map(s => (u, s, if (s % 2 == 0) "a" else "b")))
    val out = Markov.stationaryEventTypes(events(rows: _*), rounds = 6)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq("a", "b"))
    out.foreach { case (_, e12, pi) =>
      assert(e12 === 500000000000L)
      assert(pi === 0.5)
    }
  }

  test("markov: absorbing-ish skew pulls mass toward the heavy state") {
    // from a: 90% stay a, 10% go b; from b: always back to a ->
    // stationary mass on a far exceeds b
    val seq = "a" * 9 + "b" // per-user walk visiting b rarely
    val rows = (1L to 3L).flatMap(u =>
      (0L until 20L).map(s => (u, s, seq((s % 10).toInt).toString)))
    val out = Markov.stationaryEventTypes(events(rows: _*), rounds = 8)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out("a") > 4 * out("b"))
    // mass is conserved up to div-floor truncation
    val total = Markov.stationaryEventTypes(events(rows: _*), rounds = 8)
      .as[(String, Long, Double)].collect().map(_._2).sum
    assert(total > 999999000000L && total <= 1000000000000L)
  }

  test("markov: determinism across partitionings") {
    val rows = (1L to 5L).flatMap(u =>
      (0L until 12L).map(s => (u, s, Seq("x", "y", "z")((s % 3).toInt))))
    val d = events(rows: _*)
    val a = Markov.stationaryEventTypes(d).collect().map(_.toString).sorted.toSeq
    val b = Markov.stationaryEventTypes(d.repartition(7)).collect()
      .map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
