package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Breadth6

/** Round-6 batch: Theil–Sen robust slope, one-way ANOVA, HHI — each
  * checked against hand-computed values on planted fixtures.
  */
class Breadth6Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ordersOf(rows: Seq[(String, Double, String)]) =
    rows.toDF("o_orderdate", "o_totalprice", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))

  test("theilSenSlope: exact on a strictly linear monthly series") {
    // revenue = 100.00, 110.00, 120.00, 130.00 dollars over 4 months
    // → every pairwise slope = 1000 cents/month → slope2 = 2·10⁹ micro
    val o = ordersOf(Seq(
      ("2024-01-15", 100.0, "1-URGENT"), ("2024-02-15", 110.0, "1-URGENT"),
      ("2024-03-15", 120.0, "1-URGENT"), ("2024-04-15", 130.0, "1-URGENT")))
    val r = Breadth6.theilSenSlope(o).collect().head
    assert(r.getAs[Long]("n_months") == 4L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("slope2_micro") == 2L * 1000L * 1000000L)
  }

  test("theilSenSlope: one wild outlier month does not move the median") {
    // same linear series plus a crazy month — the median pairwise slope
    // stays the clean-series slope (robustness, unlike OLS)
    val base = Seq(
      ("2024-01-15", 100.0), ("2024-02-15", 110.0), ("2024-03-15", 120.0),
      ("2024-04-15", 130.0), ("2024-05-15", 140.0), ("2024-06-15", 150.0),
      ("2024-07-15", 1000000.0)) // outlier
    val o = ordersOf(base.map { case (d, v) => (d, v, "1-URGENT") })
    val r = Breadth6.theilSenSlope(o).collect().head
    assert(r.getAs[Long]("n_pairs") == 21L)
    assert(r.getAs[Long]("slope2_micro") == 2L * 1000L * 1000000L)
  }

  test("theilSenSlope: negative slopes quantize by truncation toward zero") {
    // y: 100.00 → 99.99 over 2 months from month 1 to 3: dy=-1 cents,
    // dx=2 → -0.5 micro-slope → -1e6/2 = -500000 exactly; the 1-cent
    // single-month drop gives -1000000. Series 100.00, 100.00, 99.99:
    // slopes: (m1,m2)=0, (m1,m3)=-500000, (m2,m3)=-1000000 → median -500000
    val o = ordersOf(Seq(
      ("2024-01-15", 100.0, "x"), ("2024-02-15", 100.0, "x"),
      ("2024-03-15", 99.99, "x")))
    val r = Breadth6.theilSenSlope(o).collect().head
    assert(r.getAs[Long]("slope2_micro") == 2L * -500000L)
  }

  test("anovaPriority: planted arm shift yields the textbook F") {
    // two arms only (k_arms = 2): URGENT {1.00, 2.00}, HIGH {3.00, 4.00}
    // cents: {100,200} vs {300,400}; means 150/350, grand 250
    // SSB = 2·(150−250)² + 2·(350−250)² = 40000
    // SSW = (100−150)²+(200−150)²+(300−350)²+(400−350)² = 10000
    // F = (40000/1)/(10000/2) = 8; eta2 = 0.8
    val o = ordersOf(Seq(
      ("2024-01-01", 1.0, "1-URGENT"), ("2024-01-02", 2.0, "1-URGENT"),
      ("2024-01-03", 3.0, "2-HIGH"), ("2024-01-04", 4.0, "2-HIGH")))
    val r = Breadth6.anovaPriority(o).collect().head
    assert(r.getAs[Int]("k_arms") == 2)
    assert(r.getAs[Long]("n_total") == 4L)
    assert(math.abs(r.getAs[Double]("f_stat") - 8.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("eta2") - 0.8) < 1e-9)
  }

  test("anovaPriority: identical arms give F = 0") {
    val o = ordersOf(Seq(
      ("2024-01-01", 5.0, "1-URGENT"), ("2024-01-02", 7.0, "1-URGENT"),
      ("2024-01-03", 5.0, "5-LOW"), ("2024-01-04", 7.0, "5-LOW")))
    val r = Breadth6.anovaPriority(o).collect().head
    assert(r.getAs[Double]("f_stat") == 0.0)
    assert(r.getAs[Double]("eta2") == 0.0)
  }

  private val regions = Seq((0, "AMERICA"), (1, "ASIA")).toDF("r_regionkey", "r_name")
  private val nations = Seq((10, 0), (11, 1)).toDF("n_nationkey", "n_regionkey")

  test("hhiSupplierConcentration: monopoly scores 1e6, equal split 1/n") {
    val suppliers = Seq((1, 10), (2, 11), (3, 11), (4, 11), (5, 11))
      .toDF("s_suppkey", "s_nationkey")
    // AMERICA: single supplier (monopoly). ASIA: four equal suppliers.
    val li = Seq(
      (1, 100.0, 0.0),
      (2, 50.0, 0.0), (3, 50.0, 0.0), (4, 50.0, 0.0), (5, 50.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val r = Breadth6.hhiSupplierConcentration(li, suppliers, nations, regions)
      .collect().map(x => x.getAs[String]("r_name") ->
        (x.getAs[Long]("n_suppliers"), x.getAs[Long]("hhi_micro"),
          x.getAs[Long]("top_share_micro"))).toMap
    assert(r("AMERICA") == ((1L, 1000000L, 1000000L)))
    assert(r("ASIA") == ((4L, 250000L, 250000L)))
  }

  test("hhiSupplierConcentration: discount-weighted shares, exact decimils") {
    // one region, two suppliers: 100 at 10% off (=90) vs 10 at 0% (=10)
    // shares 0.9 / 0.1 → hhi = 0.81 + 0.01 = 0.82
    val suppliers = Seq((1, 10), (2, 10)).toDF("s_suppkey", "s_nationkey")
    val li = Seq((1, 100.0, 0.10), (2, 10.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val r = Breadth6.hhiSupplierConcentration(li, suppliers, nations, regions)
      .collect().head
    assert(r.getAs[Long]("hhi_micro") == 820000L)
    assert(r.getAs[Long]("top_share_micro") == 900000L)
  }
}
