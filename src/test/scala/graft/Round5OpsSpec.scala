package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.{Baskets, Breadth3, Drift, Hits}
import graft.dedup.Dedup

/** Round-5 operator batch: HITS fixed-point, item-item CF cosine
  * neighbors, truncated EWMA, touch attribution, and asymmetric n-gram
  * containment — each checked against an independent brute-force
  * replication on a hand-sized fixture.
  */
class Round5OpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // --------------------------------------------------------------- HITS

  test("hits matches a driver-side BigInt replication of the recurrence") {
    // lineitem/orders shaped fixture: orders 1..4 map customers to parts
    val lineitem = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 103L), (4L, 101L), (4L, 103L))
      .toDF("l_orderkey", "l_suppkey")
    val orders = Seq((1L, 11L), (2L, 12L), (3L, 12L), (4L, 13L))
      .toDF("o_orderkey", "o_custkey")
    val got = Hits.hits(lineitem, orders, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // brute force with exact BigInt arithmetic: unnormalized rounds,
    // one final L1 renormalization per vector (the engine's recurrence)
    val mass = BigInt("1000000000000")
    val edges = Seq((11L, 101L), (11L, 102L), (12L, 101L), (12L, 103L), (13L, 101L), (13L, 103L))
      .map { case (c, s) => (2 * c, 2 * s + 1) }.distinct
    val hubsIds = edges.map(_._1).distinct
    var h: Map[Long, BigInt] = hubsIds.map(_ -> mass / hubsIds.size).toMap
    var a: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to 3) {
      a = edges.groupBy(_._2).map { case (d, es) => d -> es.map(e => h(e._1)).sum }
      h = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => a(e._2)).sum }
    }
    def renorm(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> (v * mass / tot) }
    }
    val expect = renorm(h).map { case (k, v) => (k, "hub") -> v.toLong } ++
      renorm(a).map { case (k, v) => (k, "authority") -> v.toLong }
    assert(got === expect)
    spark.catalog.clearCache()
  }

  test("hits guard trips past the headroom bound; renormEachRound survives it") {
    // star: ONE customer endorsing 300 suppliers — h₀ = Mass (1e12) and
    // 6 unnormalized rounds would reach ~300⁶·1e12 ≈ 7e26 score units,
    // whose final ·1e12 renorm multiply exceeds DECIMAL(38,0)
    val lineitem = (1L to 300L).map(i => (1L, i)).toDF("l_orderkey", "l_suppkey")
    val orders = Seq((1L, 5L)).toDF("o_orderkey", "o_custkey")
    val e = intercept[IllegalArgumentException] {
      Hits.hits(lineitem, orders, rounds = 6)
    }
    assert(e.getMessage.contains("renormEachRound"))
    spark.catalog.clearCache()

    // the named fallback completes and matches an exact BigInt
    // replication of the per-half-round renormalized recurrence
    val got = Hits.hits(lineitem, orders, rounds = 6, renormEachRound = true)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val mass = BigInt("1000000000000")
    val edges = (1L to 300L).map(i => (10L, 2 * i + 1)) // cust 5 -> node 10
    def renorm(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> (v * mass / tot) }
    }
    var h: Map[Long, BigInt] = Map(10L -> mass)
    var a: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to 6) {
      a = renorm(edges.groupBy(_._2).map { case (d, es) => d -> es.map(e => h(e._1)).sum })
      h = renorm(edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => a(e._2)).sum })
    }
    val expect = renorm(h).map { case (k, v) => (k, "hub") -> v.toLong } ++
      renorm(a).map { case (k, v) => (k, "authority") -> v.toLong }
    assert(got === expect)
    // sanity: the 300 authorities split the mass evenly, the hub holds it all
    assert(got((10L, "hub")) === 1000000000000L)
    assert(got((3L, "authority")) === 1000000000000L / 300)
    spark.catalog.clearCache()
  }

  test("hits default path is unchanged by the guard at safe configurations") {
    // the round-3 fixture from the replication test stays inside the
    // bound: guard computes, passes, and results are identical
    val lineitem = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 103L), (4L, 101L), (4L, 103L))
      .toDF("l_orderkey", "l_suppkey")
    val orders = Seq((1L, 11L), (2L, 12L), (3L, 12L), (4L, 13L))
      .toDF("o_orderkey", "o_custkey")
    val a = Hits.hits(lineitem, orders, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a.nonEmpty && a.values.forall(_ >= 0))
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------- item-item CF

  test("itemNeighbors matches brute-force cosine and per-item top-k") {
    val rows = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 13L),
      (4L, 12L), (4L, 13L),
      (5L, 10L), (5L, 12L), (5L, 13L))
    val got = Baskets.itemNeighbors(rows.toDF("b", "i"), "b", "i",
        minSupport = 2L, nPerItem = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getInt(4))))
      .toMap

    val itemCnt = rows.groupBy(_._2).map { case (i, xs) => i -> xs.map(_._1).distinct.size }
    val pairCnt = rows.groupBy(_._1).values.flatMap { b =>
      val is = b.map(_._2).distinct.sorted
      for (i <- is.indices; j <- (i + 1) until is.size) yield (is(i), is(j))
    }.toSeq.groupBy(identity).map { case (p, xs) => p -> xs.size }
      .filter(_._2 >= 2)
    val directed = pairCnt.toSeq.flatMap { case ((x, y), c) => Seq((x, y, c), (y, x, c)) }
    val expect = directed.groupBy(_._1).flatMap { case (item, ns) =>
      ns.map { case (_, nb, c) =>
        (item, nb, c, c.toDouble / math.sqrt((itemCnt(item) * itemCnt(nb)).toDouble))
      }.sortBy { case (_, nb, _, cos) => (-cos, nb) }
        .zipWithIndex.take(2)
        .map { case ((_, nb, c, cos), k) => (item, nb) -> ((c.toLong, cos, k + 1)) }
    }
    assert(got === expect)
    spark.catalog.clearCache()
  }

  // --------------------------------------------------------------- EWMA

  test("ewma equals the closed-form weighted lag sum; dyadic sums exact") {
    val orders = Seq(
      ("1995-01-15", "P1", 10.0), ("1995-01-20", "P1", 10.0),
      ("1995-02-10", "P1", 10.0), ("1995-03-05", "P1", 10.0),
      ("1995-01-10", "P2", 10.0))
      .toDF("o_orderdate", "o_orderpriority", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val got = Drift.ewmaMonthlyOrders(orders, lags = 3)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // P1 months: Jan=2, Feb=1, Mar=1; weights 1/2, 1/4, 1/8
    assert(got(("P1", "1995-01-01"))._2 === 2.0) // only lag 0: 2*0.5/0.5
    assert(got(("P1", "1995-02-01"))._2 === (1 * 0.5 + 2 * 0.25) / 0.75)
    assert(got(("P1", "1995-03-01"))._2 === (1 * 0.5 + 1 * 0.25 + 2 * 0.125) / 0.875)
    assert(got(("P2", "1995-01-01"))._2 === 1.0)
    spark.catalog.clearCache()
  }

  // -------------------------------------------------------- attribution

  test("touchAttribution credits first and last non-purchase touch") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: view -> click -> purchase(10) : first=view last=click
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 10.0),
      // user 1 again: purchase(5) -> first still view, last still click
      (4L, ts("2024-01-01 11:00:00"), 1L, "purchase", 5.0),
      // user 2: purchase with no preceding touch -> (none)
      (5L, ts("2024-01-02 09:00:00"), 2L, "purchase", 7.0),
      // user 3: click only, no purchase -> contributes nothing
      (6L, ts("2024-01-03 09:00:00"), 3L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Breadth3.touchAttribution(events)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("view") === ((1500L, 0L, 2L, 0L)))
    assert(got("click") === ((0L, 1500L, 0L, 2L)))
    assert(got("(none)") === ((700L, 700L, 1L, 1L)))
    assert(got.size === 3)
    spark.catalog.clearCache()
  }

  // -------------------------------------------------------- decile lift

  test("decileLift matches brute-force NTILE bucketing and exact ratios") {
    // 12 customers, balances descending by custkey; odd custkeys ordered
    val customer = (1L to 12L).map(c => (c, (130 - c * 10).toDouble)).toDF("c_custkey", "c_acctbal")
    val orders = (1L to 12L).filter(_ % 2 == 1).map(c => (c * 100, c)).toDF("o_orderkey", "o_custkey")
    val got = graft.analytics.Metrics.decileLift(customer, orders, k = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // score desc == custkey asc; NTILE(4) over 12 rows: 3 per bucket
    // positives (odd custkey): bucket1 {1,2,3}->2, b2 {4,5,6}->1, b3 {7,8,9}->2, b4 {10,11,12}->1
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val base = 6.0 / 12.0
    val expect = Map(
      1 -> ((3L, 2L, f6(2.0 / 3), f6((2.0 * 12) / (3 * 6)), f6(2.0 / 6))),
      2 -> ((3L, 1L, f6(1.0 / 3), f6((1.0 * 12) / (3 * 6)), f6(3.0 / 6))),
      3 -> ((3L, 2L, f6(2.0 / 3), f6((2.0 * 12) / (3 * 6)), f6(5.0 / 6))),
      4 -> ((3L, 1L, f6(1.0 / 3), f6((1.0 * 12) / (3 * 6)), f6(6.0 / 6))))
    assert(got === expect)
    assert(base === 0.5)
    spark.catalog.clearCache()
  }

  // ----------------------------------------------------------- modularity

  test("modularity matches the Newman formula on a two-clique graph") {
    // two triangles bridged by one edge: LPA labels them min-id cliques
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("item_a", "item_b")
    val got = graft.analytics.LabelProp.modularity(edges, "item_a", "item_b")
      .collect()(0)
    // replicate: community of each node from the engine's own LPA result
    val comm = graft.analytics.LabelProp.labelPropagation(edges, "item_a", "item_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sym = Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val s = sym.size
    val per = sym.groupBy { case (a, _) => comm(a) }.map { case (c, es) =>
      (c, es.size.toLong, es.count { case (a, b) => comm(a) == comm(b) }.toLong)
    }
    val num = per.map { case (_, dc, m2c) => m2c.toDouble * s - dc.toDouble * dc }.sum
    val q = math.floor(num / (s.toDouble * s) * 1e6 + 0.5) / 1e6
    assert(got.getLong(0) === per.size.toLong)
    assert(got.getLong(1) === (s / 2).toLong)
    assert(got.getDouble(2) === q)
    spark.catalog.clearCache()
  }

  // ---------------------------------------------------- target encoding

  test("targetEncoding is the leave-one-out mean with global fallback") {
    val orders = Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "B", 40.0), // singleton category -> global mean
      (5L, "C", 50.0), (6L, "C", 70.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = graft.analytics.Metrics.targetEncoding(orders)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val globalMean = (1000.0 + 2000 + 3000 + 4000 + 5000 + 7000) / 6
    assert(got(1L) === f6((2000.0 + 3000) / 2))
    assert(got(2L) === f6((1000.0 + 3000) / 2))
    assert(got(3L) === f6((1000.0 + 2000) / 2))
    assert(got(4L) === f6(globalMean))
    assert(got(5L) === f6(7000.0))
    assert(got(6L) === f6(5000.0))
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------ table checksum

  test("tableChecksum is row-order independent and content sensitive") {
    val mk = (rows: Seq[(Long, Long, Long, Int, Double, String)]) =>
      rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_extendedprice", "l_shipdate")
    val rows = Seq(
      (1L, 10L, 100L, 1, 12.34, "1995-01-01"),
      (1L, 11L, 101L, 2, 56.78, "1995-01-02"),
      (2L, 12L, 102L, 1, 90.12, "1995-02-03"))
    val a = graft.analytics.Metrics.tableChecksum(mk(rows)).collect()(0)
    val b = graft.analytics.Metrics.tableChecksum(mk(rows.reverse)).collect()(0)
    assert(a === b) // order independent
    val c = graft.analytics.Metrics.tableChecksum(
      mk(rows.updated(0, (1L, 10L, 100L, 1, 12.35, "1995-01-01")))).collect()(0)
    assert(a.getLong(0) === c.getLong(0))
    assert(a.getLong(1) !== c.getLong(1))
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------ welch / naive

  test("welchTTest matches a closed-form replication") {
    val orders = Seq(
      (2L, 10.0), (4L, 12.0), (6L, 14.0), // arm A (even): mean 12
      (1L, 20.0), (3L, 24.0), (5L, 28.0), (7L, 24.0)) // arm B: mean 24
      .toDF("o_orderkey", "o_totalprice")
    val r = graft.analytics.Metrics.welchTTest(orders).collect()(0)
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val a = Seq(1000.0, 1200, 1400); val b = Seq(2000.0, 2400, 2800, 2400)
    def meanv(xs: Seq[Double]) = xs.sum / xs.size
    def varv(xs: Seq[Double]) = {
      val n = xs.size
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum) / (n.toDouble * (n - 1))
    }
    val sea = varv(a) / a.size / a.size * a.size // keep shape simple below
    val se = varv(a) / a.size + varv(b) / b.size
    val t = (meanv(a) - meanv(b)) / math.sqrt(se)
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === f6(meanv(a) / 100) && r.getDouble(3) === f6(meanv(b) / 100))
    assert(math.abs(r.getDouble(4) - t) < 1e-5)
    assert(sea > 0)
    spark.catalog.clearCache()
  }

  test("seasonalNaiveBacktest lags by the season and reports exact APE") {
    val orders = (1 to 15).map { i =>
      val m = f"${1994 + (i - 1) / 12}-${(i - 1) % 12 + 1}%02d-10"
      (i.toLong, m, i * 10.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val got = graft.analytics.Drift.seasonalNaiveBacktest(orders)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // months 13..15 have a 12-back forecast: actual i*1000, forecast (i-12)*1000
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.size === 3)
    assert(got("1995-01-01") === ((13000L, 1000L, f6(12000.0 / 13000))))
    assert(got("1995-03-01") === ((15000L, 3000L, f6(12000.0 / 15000))))
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------------ RFM/LTV

  test("rfmSegments scores quintiles with 5 best and exact recency") {
    // 5 customers, one order each on distinct dates with distinct totals:
    // most recent + highest spend -> r=5, m=5; frequency all ties
    val orders = (1L to 5L).map(c =>
        (c * 10, c, s"1995-01-0$c", c * 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val got = graft.analytics.Breadth3.rfmSegments(orders)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(7)))).toMap
    // customer 5 ordered last (recency 0) and spent most; the all-tied
    // frequency resolves by custkey, so c5 takes the WORST freq quintile
    assert(got(5L) === ((0L, 1L, 50000L, "515")))
    // customer 1 is oldest (recency 4 days) and spent least; frequency
    // ties resolve by custkey so c1 takes the best frequency quintile
    assert(got(1L)._1 === 4L)
    assert(got(1L)._4 === "151")
    spark.catalog.clearCache()
  }

  test("cohortLtv builds exact month offsets and cumulative cents") {
    val orders = Seq(
      (1L, 1L, "1995-01-10", 10.0), (2L, 1L, "1995-03-15", 20.0),
      (3L, 2L, "1995-02-01", 5.0), (4L, 2L, "1995-02-20", 7.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val got = graft.analytics.Breadth3.cohortLtv(orders)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("1995-01-01", 0)) === ((1L, 1000L, 1000L)))
    assert(got(("1995-01-01", 2)) === ((1L, 2000L, 3000L)))
    assert(got(("1995-02-01", 0)) === ((1L, 1200L, 1200L)))
    assert(got.size === 3)
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------- degenerate inputs

  test("round-5 operators return empty/identity results on empty input") {
    val emptyLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
    val emptyOrd = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    assert(Hits.hits(emptyLi, emptyOrd).count() === 0)

    val emptyEdges = Seq.empty[(Long, Long)].toDF("item_a", "item_b")
    val m = graft.analytics.LabelProp.modularity(emptyEdges, "item_a", "item_b")
      .collect()(0)
    assert(m.getLong(0) === 0L && m.getLong(1) === 0L && m.getDouble(2) === 0.0)

    val emptyRows = Seq.empty[(Long, Long, Long, Int, Double, String)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_extendedprice", "l_shipdate")
    val cs = graft.analytics.Metrics.tableChecksum(emptyRows).collect()(0)
    assert(cs.getLong(0) === 0L && cs.getLong(1) === 0L)

    // customers but zero positives: lift/cum_gain report 0, not null
    val cust = (1L to 8L).map(c => (c, c * 10.0)).toDF("c_custkey", "c_acctbal")
    val dl = graft.analytics.Metrics.decileLift(cust, emptyOrd, k = 4).collect()
    assert(dl.length === 4)
    assert(dl.forall(r => r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0))
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------ hilbert curve

  test("hilbertValue is a bijection with unit-step adjacency on the 8x8 grid") {
    val bits = 3; val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong * n + y, x.toLong, y.toLong)
    val got = graft.operators.Hilbert.hilbertValue(
        cells.toDF("id", "x", "y"), "id", "x", "y", bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: standard iterative xy2d with full-mask flip
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    cells.foreach { case (id, x, y) => assert(got(id) === xy2d(x, y)) }
    // bijection onto [0, 64)
    assert(got.values.toSet === (0L until (n.toLong * n)).toSet)
    // Hilbert property: consecutive curve positions are grid-adjacent
    val byD = cells.map { case (id, x, y) => got(id) -> ((x, y)) }.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1)
    }
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------- layout prune

  test("layoutPruneStats: curve layouts confine a quadrant query to one file") {
    // full 4x4 grid, bits=2, 4 files of 4 points; rectangle = [0,1]^2
    val events = (for (x <- 0 until 4; y <- 0 until 4)
      yield ((x * 4 + y).toLong, x.toLong, y.toDouble)).toSeq
      .toDF("event_id", "user_id", "value")
    val got = graft.operators.LayoutPrune.layoutPruneStats(
        events, bits = 2, buckets = 4, rx1 = 0, rx2 = 1, ry1 = 0, ry2 = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // linear (x-major) files are x-rows: two rows intersect x<=1
    assert(got("1_linear") === ((4L, 2L)))
    // both curves make the first file exactly the query quadrant
    assert(got("2_zorder") === ((4L, 1L)))
    assert(got("3_hilbert") === ((4L, 1L)))
    spark.catalog.clearCache()
  }

  // -------------------------------------------------------- containment

  test("containmentPairs matches brute-force shingle containment") {
    // doc 2 is a strict excerpt of doc 1 (containment(2 in 1) = 1.0,
    // jaccard far below); doc 3 unrelated
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "beta gamma delta epsilon"),
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    def shingles(s: String): Set[Seq[String]] = {
      val t = s.split("\\s+").toSeq
      if (t.size < 3) Set(t) else t.sliding(3).toSet
    }
    val sets = Map(1L -> shingles("alpha beta gamma delta epsilon zeta eta theta"),
      2L -> shingles("beta gamma delta epsilon"),
      3L -> shingles("one two three four five six"))
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a != b
      c = (sets(a) & sets(b)).size.toDouble / sets(a).size
      if c >= 0.7
    } yield (a, b) -> c).toMap
    assert(got === expect)
    assert(got.contains((2L, 1L)) && !got.contains((1L, 2L)))
    spark.catalog.clearCache()
  }

  test("containmentPairs scores over the capped gram universe when maxDocsPerGram binds") {
    // "x y z" opens every doc -> df = 4 > cap 2: excluded from candidates
    // AND from the verify intersection; "y z a"/"z a b" shared by docs
    // 1,2 only (df = 2, kept). Denominator stays the FULL gram count.
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b q"),
      (3L, "x y z p q r"),
      (4L, "x y z m n o"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, n = 3, threshold = 0.5,
        maxDocsPerGram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // brute force with the same capped-universe semantics
    def shingles(s: String): Set[Seq[String]] = s.split("\\s+").toSeq.sliding(3).toSet
    val sets = docs.collect().map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val df = sets.values.flatten.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val rare = sets.map { case (id, g) => id -> g.filter(df(_) <= 2) }
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a != b
      c = (rare(a) & rare(b)).size.toDouble / sets(a).size
      if c >= 0.5
    } yield (a, b) -> c).toMap
    assert(got === expect)
    // the cap genuinely binds here: docs 1,2 share 3 of 4 grams raw but
    // only 2 of 4 in the capped universe
    assert(got((1L, 2L)) === 0.5 && got((2L, 1L)) === 0.5)
    assert(!got.contains((1L, 3L)))
    spark.catalog.clearCache()
  }

  test("itemNeighbors drops over-cap baskets exactly as documented") {
    // basket 1 holds 6 frequent items > maxBasketSize 5 -> dropped; every
    // pair count must come from the small baskets only ((10,11) would be
    // 3, not 2, if the mega-basket leaked in)
    val rows = Seq(1L -> 10L, 1L -> 11L, 1L -> 12L, 1L -> 13L, 1L -> 14L, 1L -> 15L,
      2L -> 10L, 2L -> 11L, 3L -> 10L, 3L -> 11L,
      4L -> 12L, 4L -> 13L, 5L -> 12L, 5L -> 13L,
      6L -> 14L, 6L -> 15L, 7L -> 14L, 7L -> 15L)
    val got = Baskets.itemNeighbors(rows.toDF("b", "i"), "b", "i",
        minSupport = 2L, nPerItem = 2, maxBasketSize = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getInt(4))))
      .toMap
    // item counts stay over ALL baskets (3 each); pair counts over the
    // surviving baskets: each of (10,11), (12,13), (14,15) co-occurs twice
    val cos = 2.0 / math.sqrt(9.0)
    val expect = Map(
      (10L, 11L) -> ((2L, cos, 1)), (11L, 10L) -> ((2L, cos, 1)),
      (12L, 13L) -> ((2L, cos, 1)), (13L, 12L) -> ((2L, cos, 1)),
      (14L, 15L) -> ((2L, cos, 1)), (15L, 14L) -> ((2L, cos, 1)))
    assert(got === expect)
    spark.catalog.clearCache()
  }
}
