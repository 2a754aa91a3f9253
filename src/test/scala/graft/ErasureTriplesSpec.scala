package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Baskets
import graft.etl.Erasure

/** Round-6 batch: erasure-propagation audit and Apriori-3 triples. */
class ErasureTriplesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** JVM twin of the cross-engine md5-derived 60-bit key hash. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def fold(keys: Seq[String]): Long =
    (keys.map(k => BigInt(h60(k))).sum % BigInt(1L << 61)).toLong

  test("erasureAudit: cascade counts and surviving-key checksums are exact") {
    val customer = Seq(100L, 101L, 102L).toDF("c_custkey")
    val orders = Seq((1L, 100L), (2L, 100L), (3L, 101L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 1), (1L, 2), (2L, 1), (3L, 1), (3L, 2))
      .toDF("l_orderkey", "l_linenumber")
    val rows = Erasure.erasureAudit(customer, orders, lineitem, mod = 100L)
      .collect().map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_affected"),
          r.getAs[Long]("checksum_remaining"))).toMap
    // victim: custkey 100 → orders 1,2 → lineitems (1,1),(1,2),(2,1)
    assert(rows("customer") == ((3L, 1L, fold(Seq("101", "102")))))
    assert(rows("orders") == ((3L, 2L, fold(Seq("3")))))
    assert(rows("lineitem") == ((5L, 3L, fold(Seq("3|1", "3|2")))))
  }

  test("erasureAudit: no victims → zero affected, checksum covers all keys") {
    val customer = Seq(101L, 102L).toDF("c_custkey")
    val orders = Seq((1L, 101L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 1)).toDF("l_orderkey", "l_linenumber")
    val rows = Erasure.erasureAudit(customer, orders, lineitem, mod = 1000L)
      .collect().map(r => r.getAs[String]("table_name") ->
        r.getAs[Long]("n_affected")).toMap
    assert(rows.values.forall(_ == 0L))
  }

  private def baskets(bs: Seq[(Long, Seq[Long])]) =
    bs.flatMap { case (b, is) => is.map(b -> _) }.toDF("basket", "item")

  test("frequentTriples: canonical expansion, exact supports, top-k order") {
    val b = baskets(Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L, 4L)), (3L, Seq(2L, 3L, 4L))))
    val got = Baskets.frequentTriples(b, "basket", "item").collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("item_c"), r.getAs[Long]("support"))).toList
    assert(got == List(
      (1L, 2L, 3L, 2L), (2L, 3L, 4L, 2L),
      (1L, 2L, 4L, 1L), (1L, 3L, 4L, 1L)))
  }

  test("frequentTriples: the basket-size cap drops oversized baskets") {
    val b = baskets(Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L, 4L)), (3L, Seq(2L, 3L, 4L))))
    val got = Baskets.frequentTriples(b, "basket", "item", maxBasketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("support"))).toList
    assert(got == List((1L, 2L, 3L, 1L), (2L, 3L, 4L, 1L)))
  }

  test("frequentTriples: level-1 prune removes sub-support items losslessly") {
    // item 9 appears once — no triple containing it may survive
    val b = baskets(Seq(
      (1L, Seq(1L, 2L, 3L, 9L)), (2L, Seq(1L, 2L, 3L))))
    val got = Baskets.frequentTriples(b, "basket", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 3L)))
  }
}
