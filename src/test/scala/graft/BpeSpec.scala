package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** BPE merge training: agreement with a single-node reference
  * implementation, determinism under repartitioning, and merge-fold
  * edge cases (overlapping occurrences, word-final marker).
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Straightforward single-node Sennrich reference: word-type counts,
    * best adjacent pair by (count desc, pair asc), leftmost-greedy merge.
    */
  private def referenceMerges(corpus: Seq[String], n: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        val syms = w.map(_.toString).toVector
        syms.updated(syms.length - 1, syms.last + Bpe.Eow) -> ws.size.toLong
      }
    (1 to n).flatMap { _ =>
      val pairCounts = words.toSeq.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> f }.toSeq
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (pairCounts.isEmpty) None
      else {
        val ((l, r), _) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        words = words.toSeq.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var pend: String = null
          syms.foreach { s =>
            if (pend == null) pend = s
            else if (pend == l && s == r) { out += l + r; pend = null }
            else { out += pend; pend = s }
          }
          if (pend != null) out += pend
          out.result() -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        Some((l, r))
      }
    }
  }

  test("distributed merges equal the single-node reference") {
    val corpus = Seq(
      "low low low low low", "lower lower", "newest newest newest newest newest newest",
      "widest widest widest", "new new new")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, numMerges = 10).map(m => (m._2, m._3))
    val want = referenceMerges(corpus, 10)
    assert(got === want)
    spark.catalog.clearCache()
  }

  test("merge table is partition-invariant") {
    val docs = (1L to 50L).map(i => (i, s"alpha beta gamma${i % 3} alpha beta"))
      .toDF("doc_id", "text")
    val a = Bpe.trainMerges(docs, 6)
    val b = Bpe.trainMerges(docs.repartition(7), 6)
    assert(a === b)
    spark.catalog.clearCache()
  }

  test("encodeWord applies merges leftmost-greedily with the eow marker") {
    // merges learned on a corpus dominated by 'aaaa'
    val docs = Seq((1L, "aaaa aaaa aaaa aa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 3)
    // rule 1 must be (a,a) — the most frequent adjacent pair
    assert((merges.head._2, merges.head._3) === (("a", "a")))
    val enc = Bpe.encodeWord("aaaaa", merges)
    // whatever the higher merges did, a round-trip strips to the word
    assert(enc.mkString.replace(Bpe.Eow, "") === "aaaaa")
    // overlapping occurrences merged left-to-right under rule 1 only
    val rule1 = merges.take(1)
    assert(Bpe.encodeWord("aaa", rule1).take(1) === Seq("aa"))
    spark.catalog.clearCache()
  }

  test("batched selection (B=8) equals strictly-sequential training (B=1)") {
    // a corpus rich enough to exercise batches, conflicts (shared
    // symbols force the contiguous-prefix stop) and count ties (the
    // strict-drop boundary guard): the merge TABLES must be identical
    // rule for rule, counts included
    val corpus = Seq(
      "low low low low low", "lower lower lowest",
      "newest newest newest newest newest newest", "widest widest widest",
      "new new new", "banana bandana cabana", "mississippi mississippi",
      "abracadabra abracadabra alakazam", "deed deed did dad")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sequential = Bpe.trainMerges(docs, numMerges = 40, batchSize = 1)
    val batched = Bpe.trainMerges(docs, numMerges = 40, batchSize = 8)
    assert(batched === sequential)
    spark.catalog.clearCache()
  }

  test("training stops early when every word is one symbol") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // 'ab</w>' fuses after 1 merge... ('a','b</w>'); ask for 10, get what exists
    val merges = Bpe.trainMerges(docs, 10)
    assert(merges.nonEmpty && merges.size < 10)
    spark.catalog.clearCache()
  }
}
