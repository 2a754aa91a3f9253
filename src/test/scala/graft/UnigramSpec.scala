package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Unigram

/** Unigram-LM (SentencePiece) tokenizer: agreement between the
  * distributed hard-EM trainer and the single-node integer reference,
  * Viterbi segmentation exactness, encode statistics, and the
  * degenerate-input guards.
  */
class UnigramSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "pack my box with five dozen liquor jugs pack my box",
    "sphinx of black quartz judge my vow sphinx of black quartz",
    "how vexingly quick daft zebras jump how vexingly quick",
    "the five boxing wizards jump quickly the five boxing wizards")

  private def docsDf = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t, s"src${i % 2}") }
    .toDF("doc_id", "text", "source")

  test("distributed trainer equals the single-node integer reference") {
    val got = Unigram.trainVocab(docsDf, seedMultis = 30, vocabMultis = 20,
        rounds = 2)
      .orderBy("piece")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    val want = Unigram.trainLocal(corpus, seedMultis = 30, vocabMultis = 20,
      rounds = 2)
    assert(got === want)
    spark.catalog.clearCache()
  }

  test("finalProbs agrees with the trainVocab relation") {
    val fromTrain = Unigram.trainVocab(docsDf).orderBy("piece")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    val probs = Unigram.finalProbs(docsDf)
    assert(probs === fromTrain)
    spark.catalog.clearCache()
  }

  test("trainer is partition-invariant") {
    val a = Unigram.trainVocab(docsDf, rounds = 1).orderBy("piece").collect().toSeq
    val b = Unigram.trainVocab(docsDf.repartition(7), rounds = 1)
      .orderBy("piece").collect().toSeq
    assert(a === b)
    spark.catalog.clearCache()
  }

  test("distributed Viterbi segmentation equals viterbiLocal per word") {
    val probs = Unigram.finalProbs(docsDf)
    val pmap = probs.map { case (p, _, nano) => p -> nano }.toMap
    val wt = corpus.flatMap(_.split("\\s+"))
      .filter(w => w.matches("^[a-z]+$") && w.length <= Unigram.MaxWordLen)
      .distinct.map(w => (w, 1L)).toDF("word", "freq")
    val got = Unigram.segmentPieces(wt, probs)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    got.foreach { case (word, pieces) =>
      assert(pieces === Unigram.viterbiLocal(word, pmap).toList,
        s"word=$word")
      // reassembly invariant: the segmentation concatenates to the word
      assert(pieces.mkString === word)
    }
    spark.catalog.clearCache()
  }

  test("segmentation survives pieces absent from the model (score-0 path)") {
    // 'z' and 'q' never get probability: DP scores hit 0, the packed
    // tie-break (fewer pieces, then longest last piece) still yields a
    // deterministic reassembling segmentation on both implementations
    val probs: Seq[(String, Long, Long)] =
      Seq(("a", 10L, 400000000L), ("b", 5L, 200000000L), ("ab", 5L, 200000000L))
    val pmap = probs.map { case (p, _, n) => p -> n }.toMap
    val wt = Seq(("zqzq", 1L), ("abzq", 1L), ("ab", 1L)).toDF("word", "freq")
    val got = Unigram.segmentPieces(wt, probs)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    got.foreach { case (word, pieces) =>
      assert(pieces === Unigram.viterbiLocal(word, pmap).toList)
      assert(pieces.mkString === word)
    }
    assert(got("ab") === List("ab"))
    spark.catalog.clearCache()
  }

  test("encode statistics equal the local Viterbi fold") {
    val probs = Unigram.finalProbs(docsDf)
    val pmap = probs.map { case (p, _, nano) => p -> nano }.toMap
    val got = Unigram.encodeStatsWith(docsDf, probs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.split("\\s+").toSeq
        .filter(w => w.matches("^[a-z]+$") && w.length <= Unigram.MaxWordLen)
      (i.toLong, ws.size.toLong,
        ws.map(w => Unigram.viterbiLocal(w, pmap).size.toLong).sum)
    }
    assert(got === want)
    spark.catalog.clearCache()
  }

  test("fertility equals chars-per-piece from the same model") {
    val probs = Unigram.finalProbs(docsDf)
    val rows = Unigram.fertilityBySourceWith(docsDf, probs)
      .orderBy("source").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val (chars, pieces) = (r.getLong(2), r.getLong(3))
      assert(r.getLong(4) === 1000000L * chars / pieces)
      // fertility >= 1: a piece has at least one character
      assert(r.getLong(4) >= 1000000L)
    }
    spark.catalog.clearCache()
  }

  test("MaxMatch encode equals a single-node greedy reference") {
    val probs = Unigram.finalProbs(docsDf)
    val vocab = probs.map(_._1).toSet
    def greedy(word: String): Int = {
      var pos = 0; var cnt = 0
      while (pos < word.length) {
        val l = (math.min(Unigram.MaxPieceLen, word.length - pos) to 2 by -1)
          .find(l => vocab.contains(word.substring(pos, pos + l)))
          .getOrElse(1)
        pos += l; cnt += 1
      }
      cnt
    }
    val got = Unigram.maxMatchStats(docsDf, probs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.split("\\s+").toSeq
        .filter(w => w.matches("^[a-z]+$") && w.length <= Unigram.MaxWordLen)
      (i.toLong, ws.size.toLong, ws.map(w => greedy(w).toLong).sum)
    }
    assert(got === want)
    spark.catalog.clearCache()
  }

  test("tokenizerCompare: unigram Viterbi never loses to greedy by much") {
    // same vocabulary, two segmenters: the comparison relation carries
    // both counts, and fertility = chars/pieces is internally exact
    val probs = Unigram.finalProbs(docsDf)
    val rows = Unigram.tokenizerCompare(docsDf, probs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chars, nu, nm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getLong(5) === 1000000L * chars / nu)
      assert(r.getLong(6) === 1000000L * chars / nm)
      // both segmenters stay within the word-length bounds
      assert(nu >= r.getLong(1) && nm >= r.getLong(1),
        "at least one piece per word")
      assert(nu <= chars && nm <= chars, "at most one piece per char")
    }
    spark.catalog.clearCache()
  }

  test("empty-vocabulary corpora trip the guard loudly") {
    val noWords = Seq((1L, "12345 67890 ...", "s")).toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      Unigram.trainVocab(noWords).collect()
    }
    assert(e.getMessage.contains("empty vocabulary"))
    spark.catalog.clearCache()
  }
}
