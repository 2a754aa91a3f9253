package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.similarity.Pca

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen recovers a known spectrum") {
    // diag(5, 2, 1) rotated by a fixed orthogonal matrix
    val d = Array(5.0, 2.0, 1.0)
    val th = 0.7
    val r = Array(
      Array(math.cos(th), -math.sin(th), 0.0),
      Array(math.sin(th), math.cos(th), 0.0),
      Array(0.0, 0.0, 1.0))
    val m = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum)
    val (values, _) = Pca.jacobiEigen(m)
    assert(values.sorted.reverse.zip(Array(5.0, 2.0, 1.0)).forall {
      case (got, want) => math.abs(got - want) < 1e-9
    })
  }

  test("invariants: every verdict row is 1.0 on the fixture corpus") {
    val inv = Pca.invariants(Tables.embeddings(spark, TestSpark.sfDir), k = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(inv("k") == 4.0 && inv("n_rows") > 0 && inv("dim") > 0)
    assert(inv("total_var_nano") > 0)
    for (m <- Seq("orthonormal_ok", "eigs_desc_ok", "explained_ratio_in_01",
        "proj_var_matches_eig"))
      assert(inv(m) == 1.0, s"$m failed")
  }

  test("planted low-rank structure: top components capture ~all variance") {
    val rnd = new scala.util.Random(9)
    // 8-dim data from 2 latent factors + tiny noise
    val rows = (1L to 400L).map { i =>
      val f1 = rnd.nextGaussian(); val f2 = rnd.nextGaussian()
      val v = Array.tabulate(8)(j =>
        (f1 * (j + 1) * 0.3 + f2 * math.pow(-1, j) * 0.5 +
          rnd.nextGaussian() * 0.01).toFloat)
      (i, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, 4)
    val total = model.eigenvalues.sum
    val top2 = model.eigenvalues.take(2).sum
    assert(top2 / total > 0.99, s"top-2 share ${top2 / total}")
    // components orthonormal
    for (i <- model.components.indices; j <- i until model.components.length) {
      val d = dot(model.components(i), model.components(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<c$i, c$j> = $d")
    }
    // projection variance onto pc1 ≈ eigenvalue 1 (sample variance, n-1)
    val p1 = Pca.project(df, model).select("pc1").as[Double].collect()
    val mean = p1.sum / p1.length
    val varr = p1.map(x => (x - mean) * (x - mean)).sum / (p1.length - 1)
    assert(math.abs(varr - model.eigenvalues.head) / model.eigenvalues.head < 0.01)
  }

  test("fit is deterministic under repartitioning (fixed-point covariance)") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val a = Pca.fit(e, 3)
    val b = Pca.fit(e.repartition(13), 3)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq === b.components.map(_.toSeq).toSeq)
    assert(a.mean.toSeq === b.mean.toSeq)
  }

  test("projection output is stable and k-wide on the fixture corpus") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val model = Pca.fit(e, 4)
    val out = Pca.project(e, model)
    assert(out.columns.toSeq === Seq("vec_id", "pc1", "pc2", "pc3", "pc4"))
    assert(out.count() === e.count())
    assert(model.eigenvalues.zip(model.eigenvalues.tail).forall { case (a, b) => a >= b })
  }
}
