package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Ols
import graft.dedup.Dedup
import graft.similarity.Ann

class BoilerplateRpOlsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("boilerplateSegments finds the shared footer, skips unique text") {
    val footer = "subscribe to our newsletter for updates and offers today"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $footer"),
      (2L, s"one two three four five six seven eight $footer $footer"),
      (3L, "completely different words that never repeat anywhere at all"),
      (4L, "short doc")).toDF("doc_id", "text")
    val got = Dedup.boilerplateSegments(docs, segTokens = 8, minDocs = 2L,
      k = 10).as[(String, Long, Long)].collect()
    // both 9-token docs start with a unique 8-token segment; the footer
    // segment is the tokens 9-16 slice ONLY where it starts at offset 8
    assert(got.length === 1)
    val (seg, nDocs, nTotal) = got.head
    assert(seg === footer.split(' ').take(8).mkString(" "))
    assert(nDocs === 2L && nTotal === 2L)
  }

  test("boilerplateSegments: sub-segment docs are dropped, not descended") {
    val docs = Seq((1L, "tiny"), (2L, "also tiny")).toDF("doc_id", "text")
    assert(Dedup.boilerplateSegments(docs, segTokens = 8).count() === 0)
  }

  test("randomProjection: exact signed sums, stable across partitionings") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, -1.0f, 2.0f), 0),
      (2L, Array(0.5f, 0.5f, 0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.randomProjection(e, outDims = 4)
      .as[(Long, Int, Double)].collect().sorted.toSeq
    assert(out.size === 8) // 2 vecs x 4 dims
    val again = Ann.randomProjection(e.repartition(5), outDims = 4)
      .as[(Long, Int, Double)].collect().sorted.toSeq
    assert(out === again)
    // each component is a signed sum of the elements: its magnitude is
    // bounded by the l1 norm, and parity of signs keeps it in the lattice
    out.foreach { case (_, _, c) => assert(c.abs <= 4.0 + 1e-9) }
  }

  test("randomProjection sign matrix is not constant per row or column") {
    // a one-hot vector reads out column j of the sign matrix: across
    // j = 0..15 both signs must appear for any fixed out_dim (the
    // structured-parity failure this hash was chosen to avoid)
    val oneHots = (0 until 16).map { j =>
      (j.toLong, Array.tabulate(16)(i => if (i == j) 1.0f else 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val m = Ann.randomProjection(oneHots, outDims = 4)
      .as[(Long, Int, Double)].collect()
    (0 until 4).foreach { d =>
      val signs = m.filter(_._2 == d).map(_._3.signum).toSet
      assert(signs === Set(1, -1), s"out_dim $d is constant-sign")
    }
  }

  test("OLS recovers a planted plane exactly (r2 = 1)") {
    // y = 10 + 2*q - 50*d, in dollars, on a non-degenerate grid
    val rows = for { q <- 1 to 10; d <- 0 to 5 } yield
      (q.toDouble, d / 100.0, 10.0 + 2.0 * q - 50.0 * (d / 100.0))
    val li = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val got = Ols.priceModel(li)
      .as[(Long, Double, Double, Double, Double)].collect().head
    assert(got._1 === 60L)
    assert(math.abs(got._2 - 10.0) < 1e-5, s"b0 ${got._2}")
    assert(math.abs(got._3 - 2.0) < 1e-5, s"b1 ${got._3}")
    assert(math.abs(got._4 - (-50.0)) < 1e-5, s"b2 ${got._4}")
    assert(math.abs(got._5 - 1.0) < 1e-5, s"r2 ${got._5}")
  }
}
