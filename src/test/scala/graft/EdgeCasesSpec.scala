package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Breadth2
import graft.etl.Warehouse
import graft.io.Tables
import graft.operators.GlobalRank

/** Empty- and degenerate-input behavior of the round-2 operators: every
  * one must return an empty/identity result, not throw.
  */
class EdgeCasesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("gapFillDaily on a supplier with no rows is empty, not a crash") {
    val out = Breadth2.gapFillDaily(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), suppkey = -1L)
    assert(out.count() === 0)
  }

  test("GlobalRank on empty and single-row inputs") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(GlobalRank.rankDist(empty, "v").count() === 0)
    assert(GlobalRank.ntileByRange(empty, 4, Seq("v", "id"), "t").count() === 0)

    val one = Seq((1L, 5.0)).toDF("id", "v")
    val r = GlobalRank.rankDist(one, "v").collect().head
    assert(r.getAs[Double]("pct_rank") === 0.0 && r.getAs[Double]("cume") === 1.0)
    val t = GlobalRank.ntileByRange(one, 4, Seq("v", "id"), "t").collect().head
    assert(t.getAs[Int]("t") === 1)
  }

  test("ntileByRange rejects reserved column names and k <= 0") {
    val df = Seq((1L, 2.0)).toDF("id", "__n")
    intercept[IllegalArgumentException] {
      GlobalRank.ntileByRange(df, 4, Seq("id"), "t")
    }
    intercept[IllegalArgumentException] {
      GlobalRank.ntileByRange(Seq((1L, 2.0)).toDF("id", "v"), 0, Seq("id"), "t")
    }
  }

  test("upsertByKey with empty updates is identity; empty base is updates") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Warehouse.upsertByKey(base, none, "k").collect().toSet ===
      base.collect().toSet)
    assert(Warehouse.upsertByKey(none, base, "k").collect().toSet ===
      base.collect().toSet)
  }

  test("arrayOps on whitespace-only and empty text") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val out = Breadth2.arrayOps(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(3), r.getInt(4)))).toMap
    assert(out(1L) === ((0, 0.0, 0)))
    assert(out(2L) === ((0, 0.0, 0)))
    assert(out(3L) === ((2, 3.0, 3)))
  }

  test("topTokens with k larger than the vocabulary returns the whole vocabulary") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val out = Breadth2.topTokens(docs, k = 100).collect()
    assert(out.length === 2)
  }
}
