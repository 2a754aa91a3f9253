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
