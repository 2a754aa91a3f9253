package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

class KnnClassifySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // two well-separated label clusters on orthogonal axes; ids chosen so
  // both splits see both labels (holdout = vec_id % 5 == 0)
  private def clusters() = {
    val rows = (1L to 30L).map { i =>
      val label = (i % 2).toInt
      val base = if (label == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      val jitter = (i % 7).toFloat / 100.0f
      (i, Array(base(0) + jitter * base(0), base(1) + jitter * base(1)), label)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("separated clusters classify perfectly; votes are unanimous") {
    val out = Ann.knnClassify(clusters(), k = 5)
      .as[(Long, Int, Int, Long, Boolean)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    assert(out.forall(_._1 % 5 == 0))
    out.foreach { case (_, label, pred, votes, correct) =>
      assert(pred === label)
      assert(votes === 5L)
      assert(correct)
    }
  }

  test("plurality tie breaks on the smaller label") {
    // holdout vec 5 equidistant (cosine 1 after normalization) from two
    // label-0 and two label-1 train vectors scaled differently -> k=4
    // gives a 2-2 tie, resolved to label 0
    val d = Seq(
      (5L, Array(1.0f, 1.0f), 9),
      (1L, Array(2.0f, 2.0f), 0),
      (2L, Array(3.0f, 3.0f), 0),
      (3L, Array(4.0f, 4.0f), 1),
      (4L, Array(5.0f, 5.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.knnClassify(d, k = 4)
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(out.length === 1)
    assert(out.head._3 === 0 && out.head._4 === 2L && !out.head._5)
  }

  test("determinism across partitionings") {
    val d = clusters()
    val a = Ann.knnClassify(d, k = 3).collect().map(_.toString).sorted.toSeq
    val b = Ann.knnClassify(d.repartition(7), k = 3).collect()
      .map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
