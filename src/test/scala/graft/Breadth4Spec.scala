package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Breadth4

class Breadth4Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ------------------------------------------------ rollingActiveUsers

  test("rollingActiveUsers: hand-checked 3-day window") {
    // u1 active on d1,d2; u2 on d1; u3 on d3. Windows (end day, 3-day):
    //   d1: {u1,u2}=2  d2: {u1,u2}=2  d3: all three = 3
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 09:00:00")), (2L, ts("2024-01-01 23:59:59")),
      (3L, ts("2024-01-03 00:00:01"))
    ).toDF("user_id", "ts")
    val got = Breadth4.rollingActiveUsers(ev, windowDays = 3)
      .select($"window_end".cast("string"), $"active_users", $"user_days")
      .as[(String, Long, Long)].collect()
      .map { case (k, v, w) => (k, (v, w)) }.toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 2L)), "2024-01-02" -> ((2L, 3L)),
      "2024-01-03" -> ((3L, 4L))))
  }

  test("rollingActiveUsers: windowDays=1 equals plain daily distinct") {
    val ev = Seq(
      (1L, ts("2024-03-01 01:00:00")), (2L, ts("2024-03-01 02:00:00")),
      (1L, ts("2024-03-05 03:00:00"))
    ).toDF("user_id", "ts")
    val got = Breadth4.rollingActiveUsers(ev, windowDays = 1)
      .select($"window_end".cast("string"), $"active_users")
      .as[(String, Long)].collect().toMap
    assert(got === Map("2024-03-01" -> 2L, "2024-03-05" -> 1L))
    // no phantom window ends on inactive days
    assert(!got.contains("2024-03-03"))
  }

  test("rollingActiveHll: verdicts hold and windows match the exact path") {
    val ev = (1L to 200L).map(u =>
      (u, ts(f"2024-02-${1 + (u % 9)}%02d 10:00:00"))).toDF("user_id", "ts")
    val got = graft.analytics.Breadth4.rollingActiveHll(ev, windowDays = 3)
      .select("window_end", "active_users", "sliding_ok")
      .as[(java.sql.Date, Long, Boolean)].collect()
    assert(got.length === 9) // window ends = the 9 active days (capped at max)
    assert(got.forall(_._3), "every sliding HLL verdict within bound")
    val exact = graft.analytics.Breadth4.rollingActiveUsers(ev, windowDays = 3)
      .select("window_end", "active_users")
      .as[(java.sql.Date, Long)].collect().toMap
    got.foreach { case (d, n, _) => assert(exact(d) === n) }
  }

  // ---------------------------------------------------- linkPrediction

  test("linkPrediction: path predicts the endpoints, RA = 10^12 / deg(center)") {
    // path a—b—c: only non-adjacent pair sharing a neighbor is (a,c)
    // through b with deg(b)=2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("item_a", "item_b")
    val got = Breadth4.linkPrediction(path, "item_a", "item_b", minCommon = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array((1L, 3L, 1L, 500000000000L)))
  }

  test("linkPrediction: existing edges are excluded; two wedge centers sum") {
    // 4-cycle 1-2-3-4-1: pair (1,3) shares {2,4}, pair (2,4) shares {1,3};
    // all degrees 2 so RA = 2 * 10^12/2 = 10^12. Adjacent pairs never appear.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("item_a", "item_b")
    val got = Breadth4.linkPrediction(cyc, "item_a", "item_b", minCommon = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 2L, 1000000000000L), (2L, 4L, 2L, 1000000000000L)))
  }

  test("linkPrediction: maxWedgeDegree drops wedges through hubs") {
    // star center 0 with leaves 1..4: all leaf pairs share only the hub;
    // capping the hub's degree (4) below the threshold removes every wedge
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("item_a", "item_b")
    assert(Breadth4.linkPrediction(star, "item_a", "item_b",
      minCommon = 1, maxWedgeDegree = 3).count() === 0)
    assert(Breadth4.linkPrediction(star, "item_a", "item_b",
      minCommon = 1, maxWedgeDegree = 4).count() === 6)
  }

  // ---------------------------------------------- conversion lag / repeat

  test("conversionLag: first-view-to-first-purchase day lags, non-converters drop") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-03 09:00:00")), // lag 2
      (1L, "purchase", ts("2024-01-05 09:00:00")), // later purchase ignored
      (2L, "purchase", ts("2024-01-01 08:00:00")), // before first view
      (2L, "view", ts("2024-01-01 09:00:00")),     // no purchase after -> drop
      (3L, "purchase", ts("2024-01-02 00:00:00")), // no view at all -> drop
      (4L, "view", ts("2024-01-02 00:00:00")),     // never purchases -> drop
      (5L, "view", ts("2024-01-02 01:00:00")),
      (5L, "purchase", ts("2024-01-02 23:00:00"))  // same day: lag 0
    ).toDF("user_id", "event_type", "ts")
    val got = graft.analytics.Breadth4.conversionLag(ev)
      .as[(Int, Long)].collect().toMap
    assert(got === Map(2 -> 1L, 0 -> 1L))
  }

  test("cohortRepeatRate: repeaters counted within first-order cohorts") {
    val orders = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), (2L, 10L, ts("2024-03-01 00:00:00")),
      (3L, 11L, ts("2024-01-20 00:00:00")),
      (4L, 12L, ts("2024-02-02 00:00:00")), (5L, 12L, ts("2024-02-03 00:00:00")),
      (6L, 12L, ts("2024-02-04 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = graft.analytics.Breadth4.cohortRepeatRate(orders)
      .select($"cohort_month".cast("string"), $"n_customers", $"n_repeaters", $"repeat_rate")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 1L, 0.5)),
      "2024-02-01" -> ((1L, 1L, 1.0))))
  }

  // ------------------------------------------------------ market share

  test("marketShare: hand-checked share; out-of-region and out-of-window drop") {
    val region = Seq((1, "AMERICA"), (2, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((1, "NATION_1", 1), (2, "NATION_2", 1), (3, "NATION_3", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((10L, 1), (11L, 3)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (100L, 10L, java.sql.Timestamp.valueOf("1995-06-01 00:00:00")),
      (101L, 11L, java.sql.Timestamp.valueOf("1995-07-01 00:00:00")), // ASIA cust
      (102L, 10L, java.sql.Timestamp.valueOf("1999-01-01 00:00:00"))  // out of window
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val supplier = Seq((20L, 1), (21L, 2)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((30L, "ECONOMY BRASS"), (31L, "PROMO STEEL"))
      .toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (100L, 30L, 20L, 100.0, 0.0), // NATION_1 supplier, vol 100
      (100L, 30L, 21L, 300.0, 0.0), // NATION_2 supplier, vol 300
      (100L, 31L, 20L, 999.0, 0.0), // wrong part type: dropped
      (101L, 30L, 20L, 50.0, 0.0),  // ASIA customer: dropped
      (102L, 30L, 20L, 50.0, 0.0)   // 1999 order: dropped
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val got = graft.analytics.Breadth4.marketShare(
      region, nation, customer, orders, lineitem, supplier, part)
      .select("o_year", "mkt_share", "total_volume")
      .as[(Int, Double, Double)].collect()
    assert(got.toSeq === Seq((1995, 0.25, 400.0)))
  }

  // ------------------------------------------------------ jackknife

  test("jackknife: constant values give zero SE; hand-checked two-value case") {
    // constant order value: every LOO mean equals the mean, SE = 0
    val const = (1L to 40L).map(k => (k, BigDecimal("100.00")))
      .toDF("o_orderkey", "o_totalprice")
    val z = graft.analytics.Breadth4.jackknifeMeanSe(const, buckets = 4)
      .select("n_orders", "mean_price", "jk_se").as[(Long, Double, Double)]
      .collect().head
    assert(z === ((40L, 100.0, 0.0)))
    // 2 buckets, values 100 in bucket 0 / 300 in bucket 1 (one order each):
    // LOO means are 300 and 100 dollars, m-bar = 200,
    // var_jack = ((B-1)/B)*(100^2+100^2) = 10^4 -> se = 100 dollars
    val two = Seq((2L, BigDecimal("100.00")), (3L, BigDecimal("300.00")))
      .toDF("o_orderkey", "o_totalprice")
    val j = graft.analytics.Breadth4.jackknifeMeanSe(two, buckets = 2)
      .select("n_buckets", "mean_price", "jk_se").as[(Int, Double, Double)]
      .collect().head
    assert(j._1 === 2 && math.abs(j._2 - 200.0) < 1e-9)
    assert(math.abs(j._3 - 100.0) < 1e-6)
  }

  // ------------------------------------------------------ spearman

  test("spearman: monotone spend in balance gives rho = 1, reversed gives -1") {
    val customer = Seq((1L, BigDecimal("10.00")), (2L, BigDecimal("20.00")),
      (3L, BigDecimal("30.00"))).toDF("c_custkey", "c_acctbal")
    val up = Seq((10L, 1L, BigDecimal("1.00")), (20L, 2L, BigDecimal("5.00")),
      (30L, 3L, BigDecimal("9.00"))).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r1 = Breadth4.spearmanBalanceVsSpend(customer, up)
      .as[(Long, Double)].collect().head
    assert(r1._1 === 3L && math.abs(r1._2 - 1.0) < 1e-12)
    val down = up.selectExpr("o_orderkey", "4 - o_custkey AS o_custkey", "o_totalprice")
    val r2 = Breadth4.spearmanBalanceVsSpend(customer, down)
      .as[(Long, Double)].collect().head
    assert(math.abs(r2._2 - (-1.0)) < 1e-12)
  }

  test("spearman: orderless customers rank as zero spend; ties use average ranks") {
    // balances 10 < 20 < 30 < 40; customers 1,2 have no orders (spend 0,
    // tied at doubled-avg-rank 2·1.5 = 3), 3 spends 5, 4 spends 9.
    // rx = (2,4,6,8), ry = (3,3,6,8): rho = (4·118-20·20)/sqrt((4·120-400)(4·118-400))
    val customer = Seq((1L, BigDecimal("10.00")), (2L, BigDecimal("20.00")),
      (3L, BigDecimal("30.00")), (4L, BigDecimal("40.00")))
      .toDF("c_custkey", "c_acctbal")
    val orders = Seq((1L, 3L, BigDecimal("5.00")), (2L, 4L, BigDecimal("9.00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = Breadth4.spearmanBalanceVsSpend(customer, orders)
      .as[(Long, Double)].collect().head
    val expected = (4.0 * 118 - 20 * 20) /
      math.sqrt((4.0 * 120 - 400) * (4.0 * 118 - 400))
    assert(r._1 === 4L && math.abs(r._2 - expected) < 1e-12)
  }
}
