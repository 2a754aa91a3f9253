package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Baskets

/** Market-basket counting: brute-force agreement, Apriori-prune
  * losslessness, and the mega-basket skew guard (the degenerate input the
  * cap exists for).
  */
class BasketsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** (basket, item) fixture: baskets of mixed size with overlapping items. */
  private val fixture: Seq[(Long, Long)] = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (2L, 11L),
    (3L, 10L), (3L, 11L), (3L, 13L),
    (4L, 12L), (4L, 13L),
    (5L, 10L), (5L, 12L), (5L, 13L), (5L, 14L),
    (6L, 14L), // singleton-ish: 14 appears twice, 15 once
    (7L, 15L),
    (7L, 15L) // duplicate (basket,item) row must count once
  )

  /** Exact pair counts (a < b, per-basket distinct) by brute force. */
  private def brutePairs(rows: Seq[(Long, Long)]): Map[(Long, Long), Long] =
    rows.distinct.groupBy(_._1).values.flatMap { b =>
      val items = b.map(_._2).distinct.sorted
      for (i <- items.indices; j <- (i + 1) until items.size)
        yield (items(i), items(j))
    }.toSeq.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

  test("pairLift matches brute-force counts and exact lift") {
    val got = Baskets.pairLift(fixture.toDF("b", "i"), "b", "i",
      minSupport = 2L, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val expect = brutePairs(fixture).filter(_._2 >= 2L)
    assert(got.keySet === expect.keySet)
    val itemCnt = fixture.distinct.groupBy(_._2).map { case (i, xs) =>
      i -> xs.map(_._1).distinct.size.toLong }
    val n = fixture.map(_._1).distinct.size.toLong
    expect.foreach { case (p @ (a, b), c) =>
      assert(got(p)._1 === c)
      assert(got(p)._2 === (c * n).toDouble / (itemCnt(a) * itemCnt(b)).toDouble)
    }
    spark.catalog.clearCache()
  }

  test("Apriori prune is lossless: pruned run equals unpruned-then-filtered") {
    // minSupport=3 prunes items 12,13,14,15 BEFORE pairing; the surviving
    // pairs must equal brute-force counts filtered at 3
    val got = Baskets.pairLift(fixture.toDF("b", "i"), "b", "i",
      minSupport = 3L, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === brutePairs(fixture).filter(_._2 >= 3L))
    spark.catalog.clearCache()
  }

  test("mega-basket is dropped by the cap, not exploded") {
    // one degenerate 50k-item basket (a bot cart): uncapped it would emit
    // 1.25e9 pairs on one key; with the cap the query completes fast and
    // the result equals the clean-data result
    val mega = (1L to 50000L).map(i => (999L, 100000L + i))
    val withMega = (fixture ++ mega).toDF("b", "i")
    val cleanLift = Baskets.pairLift(fixture.toDF("b", "i"), "b", "i", 2L, 100)
      .collect().map(_.toSeq).toSet
    val cappedLift = Baskets.pairLift(withMega, "b", "i", 2L, 100, maxBasketSize = 4096)
      .collect().map(_.toSeq).toSet
    // lift denominators: mega items are singletons -> pruned; n_baskets
    // grows by 1 though, so compare counts (exact) and pair sets
    val cleanPairs = cleanLift.map(r => (r(0), r(1), r(2)))
    val cappedPairs = cappedLift.map(r => (r(0), r(1), r(2)))
    assert(cappedPairs === cleanPairs)
    val edges = Baskets.coOccurrenceEdges(withMega, "b", "i", maxBasketSize = 4096)
    assert(edges.count() === brutePairs(fixture).size.toLong)
    spark.catalog.clearCache()
  }

  test("coOccurrenceEdges emits each undirected pair once, a < b") {
    val got = Baskets.coOccurrenceEdges(fixture.toDF("b", "i"), "b", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brutePairs(fixture).keySet)
    got.foreach { case (a, b) => assert(a < b) }
    spark.catalog.clearCache()
  }

  test("OnCounts paths equal the self-contained pairLift/itemNeighbors") {
    // random-ish larger fixture incl. items below minSupport
    val big = (1L to 120L).flatMap(b =>
      (0L until 1 + b % 4).map(j => b -> (b * 7 % 23 + j)))
    val df = big.toDF("b", "i")
    val counts = Baskets.coOccurrenceCounts(df, "b", "i")
    val (itemCnt, nBaskets) = Baskets.itemStats(df, "b", "i")
    val liftA = Baskets.pairLift(df, "b", "i")
      .collect().map(_.toSeq).toSeq
    val liftB = Baskets.pairLiftOnCounts(counts, itemCnt, nBaskets)
      .collect().map(_.toSeq).toSeq
    assert(liftA === liftB && liftA.nonEmpty)
    val nbrA = Baskets.itemNeighbors(df, "b", "i")
      .collect().map(_.toSeq).toSet
    val nbrB = Baskets.itemNeighborsOnCounts(counts, itemCnt)
      .collect().map(_.toSeq).toSet
    assert(nbrA === nbrB && nbrA.nonEmpty)
    spark.catalog.clearCache()
  }

  test("cfHitRate: temporal holdout hits exactly the re-co-bought pairs") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // train (<1997): {A,B} twice -> rec A<->B; {C,D} twice -> rec C<->D
    val lineitem = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L),
      // test basket: only {A,B} co-buys again
      (5L, 1L), (5L, 2L), (6L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val orders = Seq(
      (1L, ts("1996-01-01 00:00:00")), (2L, ts("1996-02-01 00:00:00")),
      (3L, ts("1996-03-01 00:00:00")), (4L, ts("1996-04-01 00:00:00")),
      (5L, ts("1997-05-01 00:00:00")), (6L, ts("1997-06-01 00:00:00"))
    ).toDF("o_orderkey", "o_orderdate")
    val got = Baskets.cfHitRate(lineitem, orders)
      .as[(Int, Long, Long, Double)].collect()
    // rank 1 recs: A->B, B->A, C->D, D->C; hits: the A/B directions
    assert(got.toSeq === Seq((1, 4L, 2L, 0.5)))
    spark.catalog.clearCache()
  }
}
