package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

class StarContractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("long chain (pathological diameter) collapses to the chain minimum") {
    // a 400-hop path: label propagation would need 400 rounds; star
    // contraction must finish within its default O(log n) iteration cap
    val chain = (1L until 400L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = labels(Dedup.dupClustersStar(chain))
    assert(got.size === 400)
    assert(got.values.toSet === Set(1L))
  }

  test("star labelling equals union-find labelling on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 120
      val edges = Seq.fill(140)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("doc_a", "doc_b")
      val star = labels(Dedup.dupClustersStar(df))
      // dupClusters at default threshold takes the union-find path here
      val uf = labels(Dedup.dupClusters(df))
      assert(star === uf, s"trial $trial diverged")
    }
  }

  test("star labelling equals the distributed min-label path") {
    val edges = Seq((10L, 20L), (20L, 30L), (40L, 50L), (60L, 60L), (5L, 30L))
      .toDF("doc_a", "doc_b")
    val star = labels(Dedup.dupClustersStar(edges))
    // force the iterative path by setting the driver threshold to zero
    val prop = labels(Dedup.dupClusters(edges, driverThreshold = 0L))
    assert(star === prop)
    assert(star(10L) === 5L && star(30L) === 5L && star(50L) === 40L)
    // a self-loop names its node as a singleton cluster (dupClusters parity)
    assert(star(60L) === 60L)
  }

  test("two disjoint dense cliques keep distinct minimum labels") {
    val c1 = for (a <- 1L to 10L; b <- (a + 1) to 10L) yield (a, b)
    val c2 = for (a <- 101L to 110L; b <- (a + 1) to 110L) yield (a, b)
    val got = labels(Dedup.dupClustersStar((c1 ++ c2).toDF("doc_a", "doc_b")))
    assert((1L to 10L).forall(got(_) === 1L))
    assert((101L to 110L).forall(got(_) === 101L))
  }
}
