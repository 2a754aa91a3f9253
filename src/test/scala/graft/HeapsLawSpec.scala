package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Heaps'-law vocabulary-growth fit: closed-form corpora with known
  * exponents, partition invariance of the two-pass prefix sums, and the
  * natural-corpus range.
  */
class HeapsLawSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("every-token-new corpus fits beta = 1, logk = 0") {
    // doc d contributes exactly one previously-unseen type: V(n) = n,
    // so ln V = 1 · ln n + 0 and the OLS fit is exact
    val docs = (0L until 40L).map(i => (i, s"tok$i")).toDF("doc_id", "text")
    val r = TextOps.heapsLaw(docs).collect()(0)
    assert(r.getLong(0) === 40L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6, s"beta=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2)) < 1e-3, s"logk=${r.getDouble(2)}")
    spark.catalog.clearCache()
  }

  test("constant-vocabulary corpus fits beta = 0") {
    // every doc repeats the same single type: V(n) = 1, ln V = 0
    val docs = (0L until 30L).map(i => (i, "same")).toDF("doc_id", "text")
    val r = TextOps.heapsLaw(docs).collect()(0)
    assert(math.abs(r.getDouble(1)) < 1e-9)
    assert(math.abs(r.getDouble(2)) < 1e-9)
    spark.catalog.clearCache()
  }

  test("fit is partition-invariant (two-pass prefix determinism)") {
    val docs = (0L until 60L)
      .map(i => (i, s"a b c tok${i % 17} tok${(i * 7) % 23}"))
      .toDF("doc_id", "text")
    val a = TextOps.heapsLaw(docs).collect()(0)
    val b = TextOps.heapsLaw(docs.repartition(13)).collect()(0)
    assert(a === b)
    spark.catalog.clearCache()
  }

  test("mixed corpus lands in the sub-linear band") {
    // types drawn from a bounded pool with fresh rares mixed in:
    // growth must be clearly sub-linear but non-degenerate
    val docs = (0L until 80L).map { i =>
      val common = (0 until 6).map(k => s"w${(i + k) % 12}").mkString(" ")
      (i, s"$common rare${i / 4}")
    }.toDF("doc_id", "text")
    val r = TextOps.heapsLaw(docs).collect()(0)
    val beta = r.getDouble(1)
    assert(beta > 0.05 && beta < 0.95, s"beta=$beta")
    spark.catalog.clearCache()
  }

  test("single-doc corpus yields the degenerate-fit NULL") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = TextOps.heapsLaw(docs).collect()(0)
    assert(r.getLong(0) === 1L)
    assert(r.isNullAt(1) && r.isNullAt(2))
    spark.catalog.clearCache()
  }
}
