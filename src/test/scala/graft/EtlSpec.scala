package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Dims, Facts}
import graft.io.Tables

class EtlSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("dim_date: continuous daily calendar with YYYYMMDD surrogate keys") {
    val dd = Dims.dimDate(spark).cache()
    assert(dd.count() === 2557) // 1995-01-01..2001-12-31 incl. two leap years
    // P3/P4 round-trip: date_id parses back to full_date
    val bad = dd.filter(
      to_date($"date_id".cast("string"), "yyyyMMdd") =!= $"full_date").count()
    assert(bad === 0)
    assert(dd.select("date_id").distinct().count() === 2557)
    dd.unpersist()
  }

  test("dims: projected, cleaned, key-unique on fixture data") {
    val dc = Dims.dimCustomer(Tables.customer(spark, sfDir))
    assert(dc.columns.toSeq === Seq("c_custkey", "c_name", "c_nationkey"))
    assert(dc.count() === dc.select("c_custkey").distinct().count())
  }

  test("fact_daily_inventory: counts sum to cleaned join input rows") {
    val li  = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val fact = Facts.factDailyInventory(li, ord).cache()
    val joinRows = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
    val summed = fact.agg(sum("inventory_count")).as[Long].head()
    assert(summed === joinRows)
    assert(fact.count() <= joinRows)
    fact.unpersist()
  }

  test("null group keys: Spark keeps them; clean-before-group removes them (SURVEY §7.4.4)") {
    val df = Seq((Some(1), 10), (None, 20), (Some(1), 30)).toDF("k", "v")
    // raw groupBy retains the null-key group (unlike pandas)
    assert(df.groupBy("k").count().count() === 2)
    // the reference's clean-first ordering makes the semantics match
    assert(graft.etl.Clean.clean(df).groupBy("k").count().count() === 1)
  }

  test("J1 invariant: inner join row count == |left| when right key is unique and covering") {
    val li  = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    assert(ord.count() === ord.select("o_orderkey").distinct().count()) // unique
    val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
    assert(joined === li.count()) // every lineitem has its order
  }

  test("fact_monthly_payment: one group per order (orderkey unique in orders)") {
    val ord = Tables.orders(spark, sfDir)
    val fact = Facts.factMonthlyPayment(ord)
    // Mirrors the reference's 16 044 → 16 044 identity (BASELINE.md): the
    // group key includes the event key, so grain == source grain.
    assert(fact.count() === ord.count())
    // date_id is first-of-month encoded
    val badDay = fact.filter($"date_id" % 100 =!= 1).count()
    assert(badDay === 0)
  }

  test("profile counts nulls and exact distincts per column in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")), (None, Some("b"))
    ).toDF("x", "y")
    val got = graft.etl.Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("x") === ((1L, 2L)))
    assert(got("y") === ((1L, 2L)))
    intercept[IllegalArgumentException] {
      graft.etl.Profile.profile(df, Seq("zzz"))
    }
  }
}
