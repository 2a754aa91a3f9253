package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Drift

class DriftPsiChiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "source", "n_chars")

  test("psi: identical halves give (near) zero drift") {
    // i mod 5 is uniform over both the even and the odd half of 1..40,
    // so each length occurs exactly 4 times per side: every bin's counts
    // match and every smoothed ratio is exactly 1 -> ln = 0
    val d = docs((1L to 40L).map(i =>
      (i, if (i % 2 == 0) "src0" else "src1", 100L + (i % 5) * 50L)))
    val r = Drift.psiDrift(d).as[(Long, Long, Double)].collect().head
    assert(r._1 === 20L && r._2 === 20L)
    assert(math.abs(r._3) < 1e-9)
  }

  test("psi: disjoint distributions drift hard; determinism across partitionings") {
    // A all short, B all long -> mass sits in opposite extreme bins
    val d = docs((1L to 30L).map(i =>
      if (i % 2 == 0) (i, "src0", 10L) else (i, "src1", 1000L)))
    val r = Drift.psiDrift(d).as[(Long, Long, Double)].collect().head
    assert(r._3 > 1.0) // PSI > 0.25 is "shifted"; disjoint is way past
    val r2 = Drift.psiDrift(d.repartition(7)).as[(Long, Long, Double)]
      .collect().head
    assert(r === r2)
  }

  test("chi-square: homogeneous mix is ~zero, skewed mix is large") {
    def events(rows: Seq[(Long, String)]) = rows.toDF("event_id", "event_type")
    // identical type mix in both halves -> expected == observed
    val same = events((1L to 40L).map(i => (i, if (i % 4 < 2) "a" else "b")))
    val r = Drift.chiSquareDrift(same).as[(Long, Long, Double)].collect().head
    assert(r._1 === 2L && r._2 === 1L)
    assert(math.abs(r._3) < 1e-6)
    // type "a" only in even half, "b" only in odd -> maximal association
    val skew = events((1L to 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")))
    val r2 = Drift.chiSquareDrift(skew).as[(Long, Long, Double)].collect().head
    // 2x2 with perfect separation: chi2 = N = 40
    assert(math.abs(r2._3 - 40.0) < 1e-6)
  }
}
