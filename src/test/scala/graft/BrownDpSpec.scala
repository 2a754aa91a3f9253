package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Drift, Privacy}

class BrownDpSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def monthlyOrders(countsByMonth: Seq[Int]) = {
    val rows = countsByMonth.zipWithIndex.flatMap { case (n, m) =>
      val ym = f"${2024 + m / 12}-${m % 12 + 1}%02d-15"
      (0 until n).map(i => (m * 1000L + i, ym))
    }
    rows.toDF("o_orderkey", "ds")
      .withColumn("o_orderdate", $"ds".cast("timestamp")).drop("ds")
  }

  test("brown: constant series gives s1 = s2 = level = forecast, trend 0") {
    val out = Drift.brownSmoothing(monthlyOrders(Seq.fill(10)(7)))
      .as[(java.sql.Date, Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1.getTime)
    assert(out.length === 10)
    out.foreach { case (_, n, s1, s2, level, trend, forecast) =>
      assert(n === 7L)
      assert(s1 === 7.0 && s2 === 7.0 && level === 7.0)
      assert(trend === 0.0 && forecast === 7.0)
    }
  }

  test("brown: rising series has positive trend and forecast above level") {
    val out = Drift.brownSmoothing(monthlyOrders((1 to 12).map(_ * 5)))
      .as[(java.sql.Date, Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1.getTime)
    // past the warm-up window the double-smoothed series lags the
    // single-smoothed one, so trend > 0 and forecast = level + trend
    val settled = out.drop(6)
    assert(settled.nonEmpty)
    settled.foreach { case (_, _, s1, s2, level, trend, forecast) =>
      assert(s1 > s2)
      assert(trend > 0.0)
      assert(forecast === level + trend)
    }
  }

  test("brown: determinism across partitionings") {
    val d = monthlyOrders((1 to 9).map(i => 3 + (i % 4)))
    val a = Drift.brownSmoothing(d).collect().map(_.toString).sorted.toSeq
    val b = Drift.brownSmoothing(d.repartition(5)).collect()
      .map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("holt-winters: first period is Brown (seasonal 0), then recovers a planted season") {
    // 36 months: linear base 100 + 2m plus a +40 every-December spike
    val series = (0 until 36).map(m => 100 + 2 * m + (if (m % 12 == 11) 40 else 0))
    val out = Drift.holtWinters(monthlyOrders(series))
      .as[(java.sql.Date, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1.getTime)
    assert(out.length === 36)
    // months 0..11 have no seasonal lag: component exactly 0, forecast = level+trend
    out.take(12).foreach { case (_, _, level, trend, seasonal, forecast) =>
      assert(seasonal === 0.0)
      assert(forecast === level + trend)
    }
    // the third December sees both seasonal lags: its component must be
    // strongly positive (the planted +40 spike), adjacent months near 0
    val dec3 = out(35)._5
    val nov3 = out(34)._5
    assert(dec3 > 20.0, s"December seasonal component must capture the spike: $dec3")
    assert(math.abs(nov3) < dec3 / 2, s"November must not inherit the spike: $nov3")
    out.foreach { case (_, _, level, trend, seasonal, forecast) =>
      assert(forecast === level + trend + seasonal)
    }
  }

  test("holt-winters: determinism across partitionings") {
    val d = monthlyOrders((0 until 30).map(m => 50 + (m * 7) % 13))
    val a = Drift.holtWinters(d).collect().map(_.toString).sorted.toSeq
    val b = Drift.holtWinters(d.repartition(5)).collect()
      .map(_.toString).sorted.toSeq
    assert(a === b)
  }

  private def customers(n: Int) =
    (1 to n).map(i => (i.toLong, i % 5, s"SEG${i % 3}"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")

  test("dp counts: noise is bounded, nonzero somewhere, deterministic") {
    val d = customers(300)
    val truth = d.groupBy("c_nationkey", "c_mktsegment").count()
      .as[(Int, String, Long)].collect()
      .map { case (nk, seg, n) => (nk, seg) -> n }.toMap
    val out = Privacy.dpNoisyCounts(d).as[(Int, String, Double, Double)].collect()
    assert(out.length === truth.size)
    // |Laplace^{-1}(u)| over the 2^20 lattice is at most (1/eps)·ln(2^21)
    val bound = math.log(math.pow(2.0, 21.0)) + 1e-6
    out.foreach { case (nk, seg, noisy, eps) =>
      assert(eps === 1.0)
      val err = math.abs(noisy - truth((nk, seg)))
      assert(err <= bound, s"noise $err out of bound for ($nk,$seg)")
    }
    // the mechanism actually perturbs: at least one group moved
    assert(out.exists { case (nk, seg, noisy, _) => noisy != truth((nk, seg)) })
    val again = Privacy.dpNoisyCounts(d.repartition(7))
      .as[(Int, String, Double, Double)].collect().sortBy(r => (r._1, r._2))
    assert(again.toSeq === out.sortBy(r => (r._1, r._2)).toSeq)
  }
}
