package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Queries
import graft.io.Tables

class QueriesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q2: at most 10 rows, descending totals, deterministic tie-break") {
    val got = Queries.q2TopParts(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), Tables.part(spark, sfDir))
      .as[(String, Long)].collect()
    assert(got.length <= 10 && got.nonEmpty)
    assert(got.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q1: one row per month, revenue positive") {
    val got = Queries.q1MonthlyRevenue(Tables.orders(spark, sfDir))
    assert(got.count() === got.select("month_start").distinct().count())
    assert(got.filter($"monthly_revenue" <= 0).count() === 0)
  }

  test("q3: filtered to one supplier, one row per day") {
    val got = Queries.q3DailySeries(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), suppkey = 1L)
    assert(got.count() === got.select("date").distinct().count())
    assert(got.count() > 0)
  }

  test("entry: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }
}
