package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.operators.RuntimeFilter

/** Bloom runtime-filter semi-join: exactness vs the plain semi-join,
  * no-false-negative guarantee of the prefilter, and plan shape (the
  * membership predicate must reach the probe side's scan filter, and the
  * plan must not broadcast the build *relation* — only the sketch rides
  * along, as a codegen reference object).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("bloomSemiJoin: row-identical to the plain left-semi join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val build = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(build.select($"o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_semi")
    val bloomed = RuntimeFilter.bloomSemiJoin(li, "l_orderkey", build, "o_orderkey")
    assert(bloomed.count() === plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("mightContain: zero false negatives, fpp roughly honored") {
    val bf = BloomFilter.create(1000, 0.03)
    (0L until 1000L).foreach(bf.putLong)
    // every inserted key answers true — bloom filters cannot false-negative
    assert((0L until 1000L).forall(bf.mightContainLong))
    // non-members: false-positive rate in the ballpark of the requested fpp
    val fps = (100000L until 110000L).count(bf.mightContainLong)
    assert(fps < 10000 * 0.03 * 3, s"false-positive rate off the rails: $fps/10000")
    // the Column surface agrees with the sketch object
    val probed = spark.range(0, 2000)
      .filter(RuntimeFilter.mightContain(bf, $"id"))
      .as[Long].collect().toSet
    assert((0L until 1000L).toSet.subsetOf(probed))
  }

  test("bloomSemiJoin plan: predicate at the probe filter, no build-relation broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable auto-broadcast so the assertion shows the operator's own
    // guarantee (at 100 TB the build side is over every threshold anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      val build = Tables.orders(spark, sfDir)
        .filter($"o_totalprice" > 400000.0).select("o_orderkey")
      val out = RuntimeFilter.bloomSemiJoin(li, "l_orderkey", build, "o_orderkey")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("graft_might_contain"),
        s"bloom predicate missing from the probe side:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"build relation must not broadcast — only the sketch ships:\n$plan")
      out.write.mode("overwrite").format("noop").save()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("empty build side yields an empty result, not a failure") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey")
    val build = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" < 0.0).select("o_orderkey")
    assert(RuntimeFilter.bloomSemiJoin(li, "l_orderkey", build, "o_orderkey").isEmpty)
  }
}
