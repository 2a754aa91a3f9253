package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Dependencies

class DependenciesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("detects holding and violated FDs with exact group counts") {
    // brand -> mfgr holds (prefix encoding); mfgr -> brand does not
    val d = Seq(
      ("M1", "B11", 1), ("M1", "B11", 2), ("M1", "B12", 3),
      ("M2", "B21", 4), ("M2", "B22", 5)
    ).toDF("mfgr", "brand", "size")
    val out = Dependencies.functionalDeps(d, Seq("mfgr", "brand", "size"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.size === 6)
    val brandToMfgr = out(("brand", "mfgr"))
    assert(brandToMfgr._3 === 4L && brandToMfgr._4 === 0L && brandToMfgr._5)
    val mfgrToBrand = out(("mfgr", "brand"))
    assert(mfgrToBrand._3 === 2L && mfgrToBrand._4 === 2L && !mfgrToBrand._5)
    // size is a key here: size -> anything holds
    assert(out(("size", "mfgr"))._5 && out(("size", "brand"))._5)
  }

  test("NULL behaves as a value, not as SQL unknown") {
    // a -> b would hold under COUNT(DISTINCT) null-dropping; the sentinel
    // makes the null a second RHS value, so the FD is violated
    val d = Seq(
      (Some("x"), Some("p")), (Some("x"), None), (Some("y"), Some("q"))
    ).toDF("a", "b")
    val out = Dependencies.functionalDeps(d, Seq("a", "b"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(!out(("a", "b"))._5 && out(("a", "b"))._4 === 1L)
    // null LHS is a group of its own
    assert(out(("b", "a"))._3 === 3L)
  }

  test("majorityRepair flags exactly the planted minority, suggests the majority") {
    // group "X": 9 of 10 rows say "a" -> the lone "b" row is flagged;
    // group "Y": 50/50 split -> below agreement, nothing flagged;
    // group "Z": unanimous -> no violation, nothing flagged
    val rows = (1L to 9L).map(i => (i, "X", "a")) ++ Seq((10L, "X", "b")) ++
      Seq((11L, "Y", "a"), (12L, "Y", "b"), (13L, "Y", "a"), (14L, "Y", "b")) ++
      (15L to 20L).map(i => (i, "Z", "c"))
    val d = rows.toDF("id", "grp", "v")
    val out = Dependencies.majorityRepair(d, "id", "grp", "v")
      .as[(Long, String, String, String, Long, Long)].collect()
    assert(out.length === 1)
    val r = out.head
    assert(r._1 === 10L && r._2 === "X" && r._3 === "b" && r._4 === "a")
    assert(r._5 === 10L && r._6 === 9L)
  }

  test("majorityRepair: groups under minSupport are never flagged") {
    val d = Seq((1L, "X", "a"), (2L, "X", "a"), (3L, "X", "b"))
      .toDF("id", "grp", "v")
    assert(Dependencies.majorityRepair(d, "id", "grp", "v", minSupport = 4)
      .count() === 0L)
  }

  test("determinism across partitionings") {
    val d = Seq(
      ("M1", "B11", 1), ("M1", "B12", 2), ("M2", "B21", 3)
    ).toDF("mfgr", "brand", "size")
    val a = Dependencies.functionalDeps(d, Seq("mfgr", "brand", "size"))
      .collect().map(_.toString).sorted.toSeq
    val b = Dependencies.functionalDeps(d.repartition(5), Seq("mfgr", "brand", "size"))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
