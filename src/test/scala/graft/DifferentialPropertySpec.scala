package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.AsOfJoin

/** Differential property tests: distributed operators vs brute-force
  * in-memory reference implementations on seeded random inputs.
  */
class DifferentialPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(2026)

  test("asOf matches the quadratic reference on random key/time data") {
    for (round <- 1 to 3) {
      val keys = 1 to 6
      val lefts = (1 to 80).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.size)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L))
      }
      val rights = (1 to 60).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.size)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
          rnd.nextDouble())
      }
      val leftDf = lefts.toDF("lid", "k", "t")
      val rightDf = AsOfJoin.latestPerKeyTs(
        rights.toDF("rid", "rk", "rt", "payload"), "rk", "rt", "rid")

      val got = AsOfJoin.asOf(leftDf, rightDf, "k", "rk", "t", "rt", Seq("rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

      // brute force: per (key, ts) keep max rid, then per left row pick the
      // row with max rt <= t
      val dedupedRights = rights.groupBy(r => (r._2, r._3.getTime))
        .map { case (_, rs) => rs.maxBy(_._1) }.toSeq
      val expected = lefts.map { case (lid, k, t) =>
        val cands = dedupedRights.filter(r => r._2 == k && !r._3.after(t))
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._3.getTime, r._1))._1))
      }.toMap
      assert(got === expected, s"round $round mismatch")
    }
  }

  test("ngramJaccard matches the all-pairs reference on random corpora") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    for (round <- 1 to 3) {
      val docs = (1 to 30).map { i =>
        val len = 4 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val threshold = 0.3
      val got = Dedup.ngramJaccard(df, n = 2, threshold = threshold)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap

      def grams(text: String): Set[String] = {
        val t = text.trim.split("\\s+").toSeq
        if (t.size < 2) Set(t.mkString(" "))
        else t.sliding(2).map(_.mkString(" ")).toSet
      }
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        ga = grams(ta); gb = grams(tb)
        j = (ga intersect gb).size.toDouble / (ga union gb).size
        if j >= threshold
      } yield (ia, ib) -> j).toMap

      assert(got.keySet === expected.keySet, s"round $round pair-set mismatch")
      got.foreach { case (p, j) =>
        assert(math.abs(j - expected(p)) < 1e-12, s"round $round value mismatch at $p")
      }
    }
  }
}
