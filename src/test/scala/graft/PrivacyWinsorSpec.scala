package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Breadth3, GraphEdges, Privacy}
import graft.io.Tables

class PrivacyWinsorSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("tCloseness: identical class distribution gives t = 0") {
    // two classes with the SAME value multiset -> each class CDF equals
    // the global CDF exactly -> EMD 0
    val df = Seq(
      (1, "A", 10.0), (1, "A", 20.0), (1, "A", 90.0),
      (2, "B", 10.0), (2, "B", 20.0), (2, "B", 90.0)
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val t = Privacy.tCloseness(df, bins = 5)
    assert(t.count() === 2)
    assert(t.filter($"t_close" =!= 0.0).isEmpty,
      "identical distributions must have zero EMD")
    assert(t.filter($"class_size" =!= 3L).isEmpty)
  }

  test("tCloseness: fully separated classes approach the max EMD") {
    // class A all in the bottom bin, class B all in the top bin; with
    // half the mass in each, |F_class - F_global| = 1/2 on every
    // interior step -> t = (B-1)*(N/2)/(n_c*N*(B-1)) ... = 0.5 exactly
    val df = Seq(
      (1, "A", 0.0), (1, "A", 0.0), (2, "B", 100.0), (2, "B", 100.0)
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val t = Privacy.tCloseness(df, bins = 10)
      .select($"c_mktsegment", $"t_close").as[(String, Double)]
      .collect().toMap
    assert(t("A") === 0.5 && t("B") === 0.5)
  }

  test("tCloseness: real table — t in [0,1], sizes sum to row count") {
    val cust = Tables.customer(spark, sfDir)
    val t = Privacy.tCloseness(cust)
    assert(t.filter($"t_close" < 0.0 || $"t_close" > 1.0).isEmpty)
    val sz = t.agg(sum("class_size")).as[Long].head()
    assert(sz === cust.count())
  }

  test("winsorizedStats: clip counts bounded, mean inside the cuts") {
    val orders = Tables.orders(spark, sfDir)
    val r = Breadth3.winsorizedStats(orders).collect().head
    val n = r.getAs[Long]("n")
    val lo = r.getAs[Double]("lo_cut"); val hi = r.getAs[Double]("hi_cut")
    val m = r.getAs[Double]("mean_wins")
    assert(n === orders.count())
    assert(lo <= hi)
    // interpolated percentile guarantees at most ~1% strictly outside
    // each cut (plus interpolation slack of one rank)
    assert(r.getAs[Long]("n_clipped_lo") <= n / 100 + 1)
    assert(r.getAs[Long]("n_clipped_hi") <= n / 100 + 1)
    assert(m >= lo - 1e-6 && m <= hi + 1e-6,
      s"winsorized mean $m must lie within [$lo, $hi]")
  }

  test("winsorizedStats: constant column clips nothing, mean = value") {
    val df = Seq.fill(50)(42.0).toDF("o_totalprice")
    val r = Breadth3.winsorizedStats(df).collect().head
    assert(r.getAs[Long]("n_clipped_lo") === 0L)
    assert(r.getAs[Long]("n_clipped_hi") === 0L)
    assert(r.getAs[Double]("mean_wins") === 42.0)
  }

  test("symmetricDistinct: matches naive union-distinct, is symmetric") {
    val half = Seq((1, 2), (2, 1), (1, 2), (3, 4), (4, 5))
      .toDF("u", "v")
    val sym = GraphEdges.symmetricDistinct(half, "u", "v")
    val got = sym.as[(Long, Long)].collect().toSet
    val naive = Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L))
    assert(got === naive)
    sym.unpersist()
  }
}
