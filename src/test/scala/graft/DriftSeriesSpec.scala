package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Drift
import graft.text.TextOps

class DriftSeriesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def orders(rows: (String, Double)*) =
    rows.zipWithIndex.map { case ((d, p), i) => (i.toLong, d, p) }
      .toDF("o_orderkey", "ds", "o_totalprice")
      .withColumn("o_orderdate", $"ds".cast("timestamp")).drop("ds")

  test("cusumChangepoint finds the planted level shift") {
    // 10 days at $100, then 10 days at $500 — the CUSUM argmax lands on
    // the last low day (prefix deviation peaks just before the shift)
    val rows = (1 to 10).map(i => (f"2024-01-$i%02d", 100.0)) ++
      (11 to 20).map(i => (f"2024-01-$i%02d", 500.0))
    val got = Drift.cusumChangepoint(orders(rows: _*)).collect().head
    assert(got.getDate(0) === Date.valueOf("2024-01-10"))
    assert(got.getLong(1) === 20L)
    assert(got.getLong(2) > 0L)
  }

  test("cusumChangepoint on a flat series: zero deviation, earliest day wins") {
    val rows = (1 to 5).map(i => (f"2024-03-$i%02d", 250.0))
    val got = Drift.cusumChangepoint(orders(rows: _*)).collect().head
    assert(got.getDate(0) === Date.valueOf("2024-03-01"))
    assert(got.getLong(2) === 0L)
  }

  test("seasonalDecompose: components re-sum to the series (x = t + s + r)") {
    val rows = (0 until 24).map { i =>
      val m = i % 12 + 1
      (f"202${i / 12}%d-$m%02d-15", 1000.0 + 200.0 * (m % 3))
    }
    val out = Drift.seasonalDecompose(orders(rows: _*))
    val bad = out.filter(
      abs($"revenue_cents" - ($"trend" + $"seasonal" + $"residual")) > 1e-2)
    assert(out.count() === 24 && bad.count() === 0)
  }

  test("bigramPmi: a planted collocation outranks independent pairs") {
    // "san francisco" always adjacent; "of" and "the" spread over
    // multiple partners, diluting their pair PMIs
    val docs = (1L to 30L).map(i =>
      (i, s"the city of san francisco welcomes the visitor of district d$i"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramPmi(docs, minCount = 5)
      .select("w_a", "w_b", "pmi").as[(String, String, Double)].collect()
      .map { case (a, b, p) => (s"$a $b", p) }.toMap
    assert(got.contains("san francisco"))
    assert(got("san francisco") > got("of san"))
    assert(got("san francisco") > got("the city"))
    spark.catalog.clearCache()
  }
}
