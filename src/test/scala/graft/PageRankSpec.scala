package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.PageRank
import graft.io.Tables

/** PageRank invariants: mass conservation (up to truncation leak),
  * partition invariance of the fixed-point ranks, and centrality ordering
  * on a hand-built graph.
  */
class PageRankSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("hub node outranks leaves on a star graph") {
    // star: hub customer 1 buys from suppliers 1..4; customer 2 only from supplier 1
    val li = Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L), (14L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L), (14L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val out = PageRank.pagerank(li, ord, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hub = out(1L * 2)                      // customer 1, degree 4
    val leaf = out(3L * 2 + 1)                 // supplier 3, degree 1
    assert(hub > leaf, s"hub=$hub leaf=$leaf")
    // supplier 1 is bought by both customers — beats single-customer suppliers
    assert(out(1L * 2 + 1) > out(2L * 2 + 1))
    spark.catalog.clearCache()
  }

  test("iters=20 keeps a bounded plan via checkpointing and exits early at the fixed point") {
    val li = Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L), (14L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L), (14L, 2L))
      .toDF("o_orderkey", "o_custkey")
    // checkpointEvery=4: after 20 rounds the live plan covers at most 4
    // rounds of joins; without truncation it would nest all 20
    val deep = PageRank.pagerank(li, ord, iters = 20, checkpointEvery = 4)
    val joins = deep.queryExecution.optimizedPlan.toString
      .linesIterator.count(_.trim.startsWith("Join"))
    assert(joins <= 12, s"plan nests $joins joins — lineage not truncated")
    // the integer recurrence reaches an exact fixed point well before 20
    // rounds on this graph: the convergence-mode result must equal the
    // fixed-iteration result (delta 0 ⇒ further rounds are no-ops)
    val fixed = deep.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val early = PageRank.pagerank(li, ord, iters = 20, checkpointEvery = 4,
      tolUnits = 0L).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(early === fixed)
    // and 5-iteration ranks are untouched by the new parameters' defaults
    val r5a = PageRank.pagerank(li, ord, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val r5b = PageRank.pagerank(li, ord, iters = 5, checkpointEvery = 8, tolUnits = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r5a === r5b)
    spark.catalog.clearCache()
  }

  test("rank mass stays ~1 (truncation can only leak mass downward)") {
    val out = PageRank.pagerank(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), iters = 3)
    val total = out.agg(org.apache.spark.sql.functions.sum("rank_units"))
      .as[Long].head()
    assert(total <= 1000000000000L, s"mass created from nothing: $total")
    assert(total > 950000000000L, s"too much truncation leak: $total")
    spark.catalog.clearCache()
  }

  test("ranks are partition-invariant (integer fixed-point, no float drift)") {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val a = PageRank.pagerank(li, ord, iters = 3)
      .select("id", "rank_units")
    val b = PageRank.pagerank(li.repartition(13), ord.repartition(7), iters = 3)
      .select("id", "rank_units")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    spark.catalog.clearCache()
  }

  test("personalized PageRank concentrates mass near the seed neighborhood") {
    // two disconnected stars: customer 1 (degree 3) and customer 9
    // (degree 2). nSeeds=1 picks customer 1; its component holds ALL
    // rank mass, the other component none.
    val li = Seq((10L, 1L), (11L, 2L), (12L, 3L), (20L, 8L), (21L, 9L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 9L), (21L, 9L))
      .toDF("o_orderkey", "o_custkey")
    val out = PageRank.personalizedPagerank(li, ord, iters = 5, nSeeds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L * 2) > 0L)                    // seed customer
    assert(out(1L * 2 + 1) > 0L)                // its supplier
    assert(out(9L * 2) === 0L)                  // far component: zero
    assert(out(8L * 2 + 1) === 0L)
    // seed outranks every non-seed node
    assert(out.filter(_._1 != 2L).values.forall(_ < out(2L)))
    spark.catalog.clearCache()
  }
}
