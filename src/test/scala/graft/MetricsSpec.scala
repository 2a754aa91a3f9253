package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Metrics
import graft.io.Tables

class MetricsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gini: equal revenues give 0, total concentration gives (n-1)/n") {
    val equal = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0))
      .toDF("o_custkey", "o_totalprice")
    assert(Metrics.giniRevenue(equal).select("gini").as[Double].head() === 0.0)

    val conc = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0))
      .toDF("o_custkey", "o_totalprice")
    // x = (0,0,0,100): G = (2*4*100 - 5*100) / (4*100) = 0.75
    assert(Metrics.giniRevenue(conc).select("gini").as[Double].head() === 0.75)

    val real = Metrics.giniRevenue(Tables.orders(spark, sfDir)).head()
    val g = real.getAs[Double]("gini")
    assert(g >= 0.0 && g <= 1.0)
  }

  test("auc: perfect separation gives 1, all-tied scores give 0.5") {
    val perfect = Seq((100.0, "1-URGENT"), (90.0, "2-HIGH"),
      (10.0, "5-LOW"), (20.0, "3-MEDIUM"))
      .toDF("o_totalprice", "o_orderpriority")
    assert(Metrics.aucPriceUrgency(perfect)
      .select("auc").as[Double].head() === 1.0)

    val tied = Seq((50.0, "1-URGENT"), (50.0, "5-LOW"),
      (50.0, "2-HIGH"), (50.0, "4-NOT SPECIFIED"))
      .toDF("o_totalprice", "o_orderpriority")
    assert(Metrics.aucPriceUrgency(tied)
      .select("auc").as[Double].head() === 0.5)

    val r = Metrics.aucPriceUrgency(Tables.orders(spark, sfDir)).head()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") ===
      Tables.orders(spark, sfDir).count())
  }

  test("mutual info: independence gives 0, perfect dependence gives ln k") {
    val indep = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"))
      .toDF("c_nationkey", "c_mktsegment")
    assert(Metrics.mutualInfo(indep).select("mi").as[Double].head() === 0.0)

    // bijective 2-class association: MI = ln 2, milli-quantized -> 0.693
    val dep = Seq((1, "A"), (1, "A"), (2, "B"), (2, "B"))
      .toDF("c_nationkey", "c_mktsegment")
    assert(Metrics.mutualInfo(dep).select("mi").as[Double].head() === 0.693)

    val mi = Metrics.mutualInfo(Tables.customer(spark, sfDir))
      .select("mi").as[Double].head()
    assert(mi >= 0.0, s"MI must be non-negative, got $mi")
  }

  test("benford: digits 1-9, shares sum to 1, expected shares are Benford") {
    val b = Metrics.benfordDigits(Tables.orders(spark, sfDir))
    val rows = b.collect()
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("digit"))))
    val obsSum = rows.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(obsSum - 1.0) < 1e-4)
    val exp1 = rows.find(_.getAs[Int]("digit") === 1)
      .map(_.getAs[Double]("exp_share"))
    assert(exp1.contains(0.30103), s"P(d=1) must be log10(2), got $exp1")
    val cnt = rows.map(_.getAs[Long]("cnt")).sum
    assert(cnt === Tables.orders(spark, sfDir).count())
  }

  test("acf: hand-computed 3-point series, real series within [-1, 1]") {
    // series (1.00, 2.00, 3.00): centered n-scaled (-300, 0, 300);
    // den = 180000; lag1 num = 0 -> 0.0; lag2 num = -90000 -> -0.5
    val fix = Seq(
      (ts("2024-01-01 00:00:00"), 1.0),
      (ts("2024-01-02 00:00:00"), 2.0),
      (ts("2024-01-03 00:00:00"), 3.0)
    ).toDF("o_orderdate", "o_totalprice")
    val got = Metrics.dailyAcf(fix, maxLag = 2)
      .select($"lag", $"acf").as[(Int, Double)].collect().toMap
    assert(got === Map(1 -> 0.0, 2 -> -0.5))

    val real = Metrics.dailyAcf(Tables.orders(spark, sfDir))
    assert(real.count() === 7)
    assert(real.filter($"acf" < -1.0 || $"acf" > 1.0).isEmpty)
  }
}
