package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Mmd

/** Linear-time MMD two-sample test: planted mean shift is detected,
  * the null split sits near zero, and the statistic is deterministic
  * under repartitioning (the global-row-number pairing).
  */
class MmdSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-gaussian coordinate from md5 bits (the
    * repo-wide hashing discipline — no RNG state).
    */
  private def coord(seed: String, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$i".getBytes("UTF-8"))
    // 4 bytes → uniform in (-0.5, 0.5); sum of 4 ≈ bell-shaped
    (0 until 4).map(k => ((h(k) & 0xff) / 255.0 - 0.5) / 2).sum
  }

  private val dim = 8

  private def mkVec(seed: String, shift: Double): Seq[Float] =
    (0 until dim).map(i => (coord(seed, i) + shift).toFloat)

  private def fixture(n: Int, shift: Double) = {
    val rows =
      (0 until n).map(i =>
        (i.toLong * 2, mkVec(s"a$i", 0.0), 0)) ++      // label 0, even ids
      (0 until n).map(i =>
        (i.toLong * 2 + 1, mkVec(s"b$i", 0.0), 0)) ++  // label 0, odd ids
      (0 until 2 * n).map(i =>
        (100000L + i, mkVec(s"c$i", shift), 1))        // label 1, shifted
    rows.toDF("vec_id", "embedding", "label")
  }

  test("planted mean shift: signal well above the null split") {
    val df = fixture(n = 60, shift = 0.6)
    val rows = Mmd.mmdLinearChecked(df, dim).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nS, signal) = rows("class0_vs_class1")
    val (nN, nul) = rows("class0_null_split")
    assert(nS === 60L && nN === 30L)
    assert(signal > 5 * math.max(nul, 1L),
      s"signal=$signal null=$nul")
    // the null sits near zero on both sides of it
    assert(math.abs(nul) < signal / 5)
    spark.catalog.clearCache()
  }

  test("no shift: both rows sit near zero") {
    val df = fixture(n = 60, shift = 0.0)
    val rows = Mmd.mmdLinearChecked(df, dim).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // same generating process: |MMD²| stays small for both pairs
    rows.values.foreach(v => assert(math.abs(v) < 40000, s"rows=$rows"))
    spark.catalog.clearCache()
  }

  test("statistic is partition-invariant (global-row-number pairing)") {
    val df = fixture(n = 40, shift = 0.3)
    val a = Mmd.mmdLinearChecked(df, dim).orderBy("pair").collect().toSeq
    val b = Mmd.mmdLinearChecked(df.repartition(11), dim)
      .orderBy("pair").collect().toSeq
    assert(a === b)
    spark.catalog.clearCache()
  }
}
