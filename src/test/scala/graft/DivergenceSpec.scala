package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Divergence

class DivergenceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("sourceTokenJsd: identical distributions diverge exactly zero") {
    // both sources carry the same token multiset -> every ln argument
    // is exactly 1, every quantized term exactly 0 — no tolerance needed
    val docs = Seq(
      (0L, "a a b", "en", "s1"), (1L, "a a b", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Divergence.sourceTokenJsd(docs)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map("s1" -> ((3L, 0L, 0.0)), "s2" -> ((3L, 0L, 0.0))))
  }

  test("sourceTokenJsd: disjoint equal-mass vocabularies hit (3/4)ln(4/3)") {
    // source s1 = {a,b}, s2 = {c,d}, equal sizes: JSD(p_s, corpus) =
    // (3/4)·ln(4/3) for each (see closed form: for t in s, q_t = p_t/2)
    val docs = Seq(
      (0L, "a b", "en", "s1"), (1L, "c d", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val expected = 0.75 * math.log(4.0 / 3.0)
    val got = Divergence.sourceTokenJsd(docs)
      .as[(String, Long, Long, Double)].collect()
    assert(got.length === 2)
    got.foreach { case (_, n, micro, jsd) =>
      assert(n === 2L)
      assert(math.abs(jsd - expected) < 1e-4)
      assert(micro === math.floor(jsd * 1e6 + 0.5).toLong)
    }
  }

  test("sourceTokenJsd: bounded by [0, ln 2] on a skewed mix") {
    val docs = Seq(
      (0L, "x x x x y", "en", "s1"), (1L, "y z z", "en", "s2"),
      (2L, "x y z w w w", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Divergence.sourceTokenJsd(docs)
      .as[(String, Long, Long, Double)].collect()
    assert(got.length === 3)
    got.foreach { case (_, _, _, jsd) =>
      assert(jsd >= -1e-9 && jsd <= math.log(2.0) + 1e-9)
    }
  }
}
