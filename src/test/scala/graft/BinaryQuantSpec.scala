package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.BinaryQuant

class BinaryQuantSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("pack: sign bits land in the right 32-bit word positions") {
    // dim 40 -> 2 words; positive dims 0, 1, 33, 39
    val v = Seq.tabulate(40)(i =>
      if (Set(0, 1, 33, 39).contains(i)) 1.0f else -1.0f)
    val out = BinaryQuant.pack(emb(1L -> v), dim = 40)
      .as[(Long, Seq[Long])].collect()
    assert(out.length === 1)
    val words = out.head._2
    assert(words === Seq(3L, (1L << 1) | (1L << 7)))
  }

  test("pack: zero values do not set bits (strict > 0)") {
    val out = BinaryQuant.pack(emb(1L -> Seq(0.0f, 1.0f, -0.5f, 0.0f)), dim = 4)
      .as[(Long, Seq[Long])].collect()
    assert(out.head._2 === Seq(2L))
  }

  test("hamming top-k: exact distances, self excluded, ties break by id") {
    // 4-dim corpus; q = vec 1 [+,+,-,-]
    val data = emb(
      1L -> Seq(1f, 1f, -1f, -1f),   // query
      2L -> Seq(1f, 1f, 1f, -1f),    // hamming 1
      3L -> Seq(1f, -1f, 1f, -1f),   // hamming 2
      4L -> Seq(-1f, 1f, -1f, 1f),   // hamming 2 (tie with 3 -> id order)
      5L -> Seq(-1f, -1f, 1f, 1f))   // hamming 4
    val out = BinaryQuant.hammingTopK(data, dim = 4, nQueries = 1, k = 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq === Seq(
      (1L, 2L, 1L, 1), (1L, 3L, 2L, 2), (1L, 4L, 2L, 3)))
  }

  test("mih: banded retrieval finds the planted flipped-sign source at distance <= 1") {
    // every probe flips dimension (vec_id % 64); with all-nonzero dims the
    // source vector sits at hamming exactly 1 and must rank first
    val rnd = new scala.util.Random(11)
    val data = (0L to 29L).map(i =>
      i -> Seq.fill(64)(rnd.nextFloat() - 0.5f).map(x =>
        if (x == 0f) 0.1f else x))
    val out = BinaryQuant.mihTopK(emb(data: _*), dim = 64, radius = 3, k = 5)
      .as[(Long, Long, Long, Int)].collect()
    val top = out.filter(_._4 == 1).map(r => r._1 -> ((r._2, r._3))).toMap
    (0L to 29L).foreach { q =>
      assert(top.contains(q), s"probe $q found no neighbor")
      assert(top(q) === ((q, 1L)), s"probe $q top hit was ${top(q)}")
    }
  }

  test("mih: equals brute force within radius (pigeonhole completeness)") {
    val rnd = new scala.util.Random(23)
    val data = (0L to 39L).map(i =>
      i -> Seq.fill(64)(rnd.nextFloat() - 0.5f))
    val out = BinaryQuant.mihRecall(emb(data: _*), dim = 64, radius = 3,
        nQueries = 40)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 40)
    out.foreach { case (q, nBrute, nHit, recall) =>
      assert(nBrute >= 1L, s"probe $q has no brute neighbor")
      assert(nHit === nBrute && recall === 1000000L,
        s"probe $q recall $recall ($nHit/$nBrute)")
    }
  }

  test("mih: radius beyond the pigeonhole bound is refused") {
    val ex = intercept[IllegalArgumentException] {
      BinaryQuant.mihTopK(emb(1L -> Seq.fill(64)(1f)), dim = 64, radius = 4)
    }
    assert(ex.getMessage.contains("pigeonhole"))
  }

  test("hamming top-k: determinism across partitionings") {
    val rnd = new scala.util.Random(7)
    val data = (1L to 40L).map(i =>
      i -> Seq.fill(64)(rnd.nextFloat() - 0.5f))
    val df = emb(data: _*)
    val a = BinaryQuant.hammingTopK(df, nQueries = 5, k = 4)
      .collect().map(_.toString).sorted.toSeq
    val b = BinaryQuant.hammingTopK(df.repartition(9), nQueries = 5, k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
