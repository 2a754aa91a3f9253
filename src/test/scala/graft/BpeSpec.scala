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

  /** Single-node Sennrich reference — the library's own pure-Scala
    * trainer ([[Bpe.trainMergesLocal]]), reduced to (l, r) pairs.
    */
  private def referenceMerges(corpus: Seq[String], n: Int): Seq[(String, String)] =
    Bpe.trainMergesLocal(corpus, n).map(m => (m._2, m._3))

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

  test("encodeCorpus counts equal the driver-side encoder, word for word") {
    // overlapping repeats ("aaaa"), multi-rule interactions, and words
    // the merge table never saw — the replace-chain encoding must agree
    // with encodeWord exactly
    val merges = Bpe.trainMergesLocal(
      Seq("low low low lowest newest newest newest widest banana banana aaaa aa"), 12)
    val docs = Seq(
      (1L, "aaaa aa aaa banana low lowest"),
      (2L, "newest widest bananas lowly unknownword"),
      (3L, "a aa aaa aaaa aaaaa")
    ).toDF("doc_id", "text")
    val got = Bpe.encodeCorpus(docs, merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = Seq(
      1L -> "aaaa aa aaa banana low lowest",
      2L -> "newest widest bananas lowly unknownword",
      3L -> "a aa aaa aaaa aaaaa"
    ).map { case (id, text) =>
      val ws = text.split("\\s+").filter(_.matches("^[a-z]+$"))
      id -> ((ws.length.toLong, ws.map(w => Bpe.encodeWord(w, merges).size.toLong).sum))
    }.toMap
    assert(got === expect)
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
