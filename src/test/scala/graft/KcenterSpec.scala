package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.similarity.Kcenter

class KcenterSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("planted far clusters are visited before any near-duplicate") {
    // three tight clusters far apart + jitter twins; the farthest-point
    // traversal must touch all three clusters within the first 3 picks
    def pt(base: Double, eps: Double) = Seq.tabulate(4)(i => base + eps * (i + 1))
    val fixture = emb(
      0L -> pt(0.0, 0.001), 1L -> pt(0.0, 0.002),
      2L -> pt(10.0, 0.001), 3L -> pt(10.0, 0.002),
      4L -> pt(-10.0, 0.001), 5L -> pt(-10.0, 0.002))
    val picks = Kcenter.kcenterSelect(fixture, k = 3).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1))
    val cluster = Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2)
    assert(picks.map(cluster).toSet === Set(0, 1, 2),
      s"first 3 picks must cover all 3 clusters, got ${picks.toSeq}")
    assert(picks.head === 0L, "seed is the min vec_id")
  }

  test("radius curve is non-increasing and picks are distinct") {
    val out = Kcenter.kcenterSelect(Tables.embeddings(spark, sfDir), k = 6)
      .collect().sortBy(_.getInt(0))
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length === ids.length, "no point selected twice")
    val radii = out.drop(1).map(_.getDouble(2)) // rounds 2..k
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"Gonzalez radius sequence must be non-increasing: ${radii.toSeq}")
    assert(out.head.getDouble(2) === 0.0, "seed distance is 0")
  }

  test("trajectory is deterministic and matches a driver-side replay") {
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .limit(64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val fixture = emb(e.map { case (id, v) => id -> v.toSeq }: _*)
    def l2r6(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val k = 5
    var sel = Vector(e.head)
    var expect = Vector((1, e.head._1, 0.0))
    for (r <- 2 to k) {
      val selIds = sel.map(_._1).toSet
      val cand = e.filter(p => !selIds.contains(p._1))
        .map { case (id, v) => (id, sel.map(s => l2r6(v, s._2)).min) }
      val (pid, pd) = cand.minBy { case (id, d) => (-d, id) }
      sel :+= e.find(_._1 == pid).get
      expect :+= ((r, pid, pd))
    }
    val got = Kcenter.kcenterSelect(fixture, k = k).collect()
      .sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === expect)
  }
}
