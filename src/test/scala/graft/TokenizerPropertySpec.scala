package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Unigram

/** Property checks for the tokenizer-family folds on random corpora
  * and random vocabularies: what MUST hold on every input is
  *   (a) the distributed packed-BIGINT Viterbi fold equals the
  *       single-node reference segmentation word for word,
  *   (b) every segmentation (Viterbi and greedy) concatenates back to
  *       its word,
  *   (c) Viterbi's segmentation probability is ≥ greedy MaxMatch's
  *       under the SAME model (optimality of the lattice over the
  *       heuristic — the reason both families exist),
  *   (d) EM never loses alphabet coverage (every character survives
  *       every round's prune).
  */
class TokenizerPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  private def randWord(): String = {
    val alpha = "abcdef" // small alphabet → dense piece collisions
    val len = 1 + rnd.nextInt(Unigram.MaxWordLen)
    (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
  }

  private def randCorpus(): Seq[String] =
    (1 to 12).map(_ => (1 to (3 + rnd.nextInt(8))).map(_ => randWord())
      .mkString(" "))

  /** Integer log-score of a segmentation under the nano model — the
    * sequential requantized product the DP maximizes.
    */
  private def score(pieces: Seq[String], pm: Map[String, Long]): Long =
    pieces.foldLeft(Unigram.Nano)((acc, p) =>
      acc * pm.getOrElse(p, 0L) / Unigram.Nano)

  test("fold == reference, reassembly, Viterbi ≥ greedy, on random corpora") {
    for (trial <- 1 to 4) {
      val corpus = randCorpus()
      val docs = corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t, s"s${i % 2}") }
        .toDF("doc_id", "text", "source")
      val probs = Unigram.finalProbs(docs, seedMultis = 20, vocabMultis = 15,
        rounds = 2)
      val pm = probs.map { case (p, _, n) => p -> n }.toMap

      // (d) alphabet coverage survives training
      val chars = corpus.flatMap(_.split(" ")).flatten.map(_.toString).toSet
      assert(chars.subsetOf(probs.map(_._1).toSet), s"trial $trial")

      val words = corpus.flatMap(_.split(" "))
        .filter(w => w.nonEmpty && w.length <= Unigram.MaxWordLen).distinct
      val wt = words.map((_, 1L)).toDF("word", "freq")
      val got = Unigram.segmentPieces(wt, probs)
        .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap

      def greedy(word: String): List[String] = {
        var pos = 0; val out = List.newBuilder[String]
        while (pos < word.length) {
          val l = (math.min(Unigram.MaxPieceLen, word.length - pos) to 2 by -1)
            .find(l => pm.contains(word.substring(pos, pos + l))).getOrElse(1)
          out += word.substring(pos, pos + l); pos += l
        }
        out.result()
      }

      words.foreach { w =>
        val viterbi = got(w)
        // (a) distributed fold == single-node reference
        assert(viterbi === Unigram.viterbiLocal(w, pm).toList,
          s"trial $trial word $w")
        // (b) both segmentations reassemble
        assert(viterbi.mkString === w)
        val g = greedy(w)
        assert(g.mkString === w)
        // (c) lattice optimality: Viterbi score ≥ greedy score
        assert(score(viterbi, pm) >= score(g, pm),
          s"trial $trial word $w viterbi=$viterbi greedy=$g")
      }
      spark.catalog.clearCache()
    }
  }
}
