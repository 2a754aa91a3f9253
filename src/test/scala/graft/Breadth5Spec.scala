package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Breadth5, Harmonic}

class Breadth5Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ------------------------------------------------ survivalCurve

  test("survivalCurve: hand-checked life table with event/censor mix") {
    // A: repeat after 2d (event t=2); B: one order, censored at max date
    // (t=8); C: same-day repeat (event t=0); D: repeat after 5d (t=5).
    val orders = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), (2L, 10L, ts("2024-01-03 00:00:00")),
      (3L, 11L, ts("2024-01-02 00:00:00")),
      (4L, 12L, ts("2024-01-04 00:00:00")), (5L, 12L, ts("2024-01-04 00:00:00")),
      (6L, 13L, ts("2024-01-05 00:00:00")), (7L, 13L, ts("2024-01-10 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Breadth5.survivalCurve(orders)
      .orderBy("t_days")
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    // life table: t=0 n=4 d=1; t=2 n=3 d=1; t=5 n=2 d=1 (t=8 censor only)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ===
      Seq((0, 4L, 1L, 0L), (2, 3L, 1L, 0L), (5, 2L, 1L, 0L)))
    // Nelson-Aalen: 1e12//4, +1e12//3, +1e12//2
    assert(got.map(_._5).toSeq ===
      Seq(250000000000L, 583333333333L, 1083333333333L))
    // KM: 3/4, 1/2, 1/4 (quantized-ln path rounds to 1e-6)
    val km = got.map(_._6)
    assert(math.abs(km(0) - 0.75) < 2e-6)
    assert(math.abs(km(1) - 0.5) < 2e-6)
    assert(math.abs(km(2) - 0.25) < 2e-6)
  }

  test("survivalCurve: exhausted risk set pins survival to zero, no ln(0)") {
    // both customers repeat at t=1; last event empties the risk set
    val orders = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), (2L, 10L, ts("2024-01-02 00:00:00")),
      (3L, 11L, ts("2024-01-01 00:00:00")), (4L, 11L, ts("2024-01-02 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Breadth5.survivalCurve(orders)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1, 2L, 2L, 0L, 1000000000000L, 0.0)))
  }

  // ------------------------------------------------ ndcgAtK

  test("ndcgAtK: uniformly relevant corpus scores exactly 1") {
    // every candidate has the query's source AND lang (rel 3), so any
    // ranking is ideal; shared token keeps every candidate BM25-scored
    val docs = (0L to 11L).map(i =>
      (i, s"common w$i", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val got = Breadth5.ndcgAtK(docs, k = 10, nQueries = 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (qid, dcg, idcg, ndcg) = got.head
    assert(qid === 0L && dcg === idcg && ndcg === 1.0)
    // idcg = 7 * sum of the ten nano discounts
    assert(idcg === 7L * 4543559338L)
  }

  test("ndcgAtK: no relevant documents gives ndcg 0 with zero idcg") {
    val docs = Seq(
      (0L, "common alpha", "fr", "unique"),
      (1L, "common beta", "en", "s1"),
      (2L, "common gamma", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val got = Breadth5.ndcgAtK(docs, k = 10, nQueries = 1)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got === ((0L, 0L, 0L, 0.0)))
  }

  test("ndcgAtK: dcg never exceeds idcg on a mixed corpus") {
    val docs = (0L to 19L).map(i => (i, s"common tok${i % 3} tok${i % 5}",
      if (i % 2 == 0) "en" else "de",
      s"s${i % 4}")).toDF("doc_id", "text", "lang", "source")
    val got = Breadth5.ndcgAtK(docs, k = 10, nQueries = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === 4)
    got.foreach { case (_, dcg, idcg, ndcg) =>
      assert(dcg <= idcg)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
  }

  // ------------------------------------------------ mapMrrAtK

  test("mapMrrAtK: uniformly relevant corpus gives AP = MRR = 1") {
    val docs = (0L to 11L).map(i =>
      (i, s"common w$i", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val got = Breadth5.mapMrrAtK(docs, k = 10, nQueries = 1)
      .as[(Long, Long, Long, Int, Long, Long)].collect().head
    // 11 relevant candidates, 10 ranked, every prefix precision is 1
    assert(got === ((0L, 11L, 10L, 1, 1000000000L, 1000000000L)))
  }

  test("mapMrrAtK: no relevant documents scores all zeros") {
    val docs = Seq(
      (0L, "common alpha", "en", "unique"),
      (1L, "common beta", "en", "s1"),
      (2L, "common gamma", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val got = Breadth5.mapMrrAtK(docs, k = 10, nQueries = 1)
      .as[(Long, Long, Long, Int, Long, Long)].collect().head
    assert(got === ((0L, 0L, 0L, 0, 0L, 0L)))
  }

  test("mapMrrAtK: relevant at rank 2 gives MRR = AP = 0.5 in nanos") {
    // doc 1 matches both query tokens (rank 1, irrelevant source);
    // doc 2 matches one token in a longer doc (rank 2, relevant source)
    val docs = Seq(
      (0L, "alpha beta", "en", "sA"),
      (1L, "alpha beta", "en", "sB"),
      (2L, "alpha filler filler filler", "en", "sA"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Breadth5.mapMrrAtK(docs, k = 10, nQueries = 1)
      .as[(Long, Long, Long, Int, Long, Long)].collect().head
    // R=1, hit at rank 2: mrr = 1e9 div 2; ap = (1e9*1 div 2) div 1
    assert(got === ((0L, 1L, 1L, 2, 500000000L, 500000000L)))
  }

  // ------------------------------------------------ calibrationBins

  test("calibrationBins: hand-checked two-bin table and Brier score") {
    val customer = Seq(
      (1L, BigDecimal("0.00")), (2L, BigDecimal("3.00")),
      (3L, BigDecimal("6.00")), (4L, BigDecimal("9.00")))
      .toDF("c_custkey", "c_acctbal")
    // customers 3 and 4 are repeaters (2 orders each)
    val orders = Seq((1L, 3L), (2L, 3L), (3L, 4L), (4L, 4L), (5L, 1L))
      .toDF("o_orderkey", "o_custkey")
    val got = Breadth5.calibrationBins(customer, orders, bins = 2)
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    // cents 0,300,600,900; bin = c*2 div 901 -> 0,0,1,1
    // score_ppm = c*1e6 div 900 -> 0, 333333, 666666, 1000000
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((0, 2L, 0L), (1, 2L, 2L)))
    assert(math.abs(got(0)._4 - 333333.0 / 2e6) < 1e-12)
    assert(math.abs(got(1)._4 - 1666666.0 / 2e6) < 1e-12)
    assert(got(0)._5 === 0.0 && got(1)._5 === 1.0)
    // residuals: 0, 333333, 666666-1e6 = -333334, 0
    val brier = (333333.0 * 333333 + 333334.0 * 333334) / (4.0 * 1e12)
    assert(math.abs(got(0)._6 - brier) < 1e-15)
    assert(got(0)._6 === got(1)._6)
  }

  // ------------------------------------------------ positionAttribution

  test("positionAttribution: U-shaped 40/20/40 credits on a 4-touch path") {
    val ev = Seq(
      (1L, 1L, "ad", ts("2024-01-01 10:00:00"), 0.0),
      (2L, 1L, "email", ts("2024-01-01 11:00:00"), 0.0),
      (3L, 1L, "search", ts("2024-01-01 12:00:00"), 0.0),
      (4L, 1L, "social", ts("2024-01-01 13:00:00"), 0.0),
      (5L, 1L, "purchase", ts("2024-01-01 14:00:00"), 10.0),
      (6L, 1L, "view", ts("2024-01-01 15:00:00"), 0.0), // after purchase: no credit
      (7L, 1L, "purchase", ts("2024-01-01 16:00:00"), 99.0) // 2nd purchase ignored
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Breadth5.positionAttribution(ev)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // purchase cents 1000; first/last 400000, middles 200000 div 2 = 100000
    assert(got === Map(
      "ad" -> ((1L, 400000L * 1000)), "social" -> ((1L, 400000L * 1000)),
      "email" -> ((1L, 100000L * 1000)), "search" -> ((1L, 100000L * 1000))))
  }

  test("positionAttribution: 1-touch, 2-touch and no-touch paths") {
    val ev = Seq(
      // user 1: single touch takes full credit
      (1L, 1L, "ad", ts("2024-01-01 10:00:00"), 0.0),
      (2L, 1L, "purchase", ts("2024-01-01 11:00:00"), 2.0),
      // user 2: two touches split 50/50
      (3L, 2L, "email", ts("2024-01-01 10:00:00"), 0.0),
      (4L, 2L, "search", ts("2024-01-01 11:00:00"), 0.0),
      (5L, 2L, "purchase", ts("2024-01-01 12:00:00"), 4.0),
      // user 3: purchase with no prior touch -> "(none)"
      (6L, 3L, "purchase", ts("2024-01-01 09:00:00"), 3.0),
      // user 4: touches but never purchases -> nothing
      (7L, 4L, "ad", ts("2024-01-01 08:00:00"), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Breadth5.positionAttribution(ev)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "ad" -> ((1L, 1000000L * 200)),
      "email" -> ((1L, 500000L * 400)), "search" -> ((1L, 500000L * 400)),
      "(none)" -> ((1L, 1000000L * 300))))
  }

  // ------------------------------------------------ harmonic centrality

  test("landmarkHarmonic: path graph, single landmark at the lowest tied hub") {
    // path 1-2-3-4-5: degrees 1,2,2,2,1 — top-1 landmark = node 2 (tie
    // broken node asc). Distances from 2: 1->1, 3->1, 4->2, 5->3.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = Harmonic.landmarkHarmonic(path, "u", "v", nLandmarks = 1, rounds = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((1L, 1000000L)), 3L -> ((1L, 1000000L)),
      4L -> ((1L, 500000L)), 5L -> ((1L, 333333L))))
  }

  test("landmarkHarmonic: two landmarks sum reciprocal distances") {
    // 4-cycle 1-2-3-4-1, landmarks {1,2}: node 3 = 1/2 + 1/1, node 4 =
    // 1/1 + 1/2, node 1 = 1/1 (from lm 2), node 2 = 1/1 (from lm 1)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got = Harmonic.landmarkHarmonic(cyc, "u", "v", nLandmarks = 2, rounds = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((1L, 1000000L)), 2L -> ((1L, 1000000L)),
      3L -> ((2L, 1500000L)), 4L -> ((2L, 1500000L))))
  }

  // ------------------------------------------------ Ivm.topKView

  test("topKView: delta flips the leader and drops emptied groups") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val base = Seq(("a", 2L, 100L), ("b", 1L, 80L), ("c", 1L, 60L))
      .toDF("grp", "cnt", "total")
    // delete all of a (cnt 2, total 100), boost c past b
    val changes = Seq(
      ("a", 40L, true), ("a", 60L, true),
      ("c", 50L, false)).toDF("grp", "q", "is_delete")
    val got = graft.operators.Ivm.topKView(base, changes, Seq("grp"), "q", k = 2)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("c", 2L, 110L), ("b", 1L, 80L)))
    // matches the from-scratch recompute of the merged snapshot
    val merged = Seq(("b", 80L), ("c", 60L), ("c", 50L)).toDF("grp", "q")
    val re = merged.groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("q")).as("total"))
      .orderBy(col("total").desc, col("grp").asc).limit(2)
      .as[(String, Long, Long)].collect()
    assert(re.toSeq === got.toSeq)
  }

  test("topKView: folding two CDC batches equals the one-shot recompute") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val baseRows = Seq(("a", 10L), ("a", 20L), ("b", 50L), ("c", 5L))
    val b1 = Seq(("a", 10L, true), ("d", 70L, false))
    val b2 = Seq(("b", 50L, true), ("d", 70L, true), ("c", 100L, false))
    val base = baseRows.toDF("grp", "q").groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("q")).as("total"))
    val after1 = graft.operators.Ivm.applyDelta(
      base, b1.toDF("grp", "q", "is_delete"), Seq("grp"), "q")
    val incr = graft.operators.Ivm.topKView(
      after1, b2.toDF("grp", "q", "is_delete"), Seq("grp"), "q", k = 3)
      .as[(String, Long, Long)].collect()
    // survivors: a={20}, c={5,100}, b and d fully retracted
    val re = Seq(("a", 20L), ("c", 5L), ("c", 100L)).toDF("grp", "q")
      .groupBy("grp").agg(count(lit(1)).as("cnt"), sum(col("q")).as("total"))
      .orderBy(col("total").desc, col("grp").asc).limit(3)
      .as[(String, Long, Long)].collect()
    assert(incr.toSeq === re.toSeq)
    assert(incr.map(_._1).toSet === Set("a", "c"))
  }
}
