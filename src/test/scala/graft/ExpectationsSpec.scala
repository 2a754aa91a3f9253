package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Expectations

class ExpectationsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("rowChecks: violations counted, NULL predicate counts as violation") {
    val df = Seq(
      (Some(10.0), Some("O")), (Some(-1.0), Some("X")),
      (None: Option[Double], Some("F")), (Some(5.0), None: Option[String]))
      .toDF("price", "status")
    val got = Expectations.rowChecks(df, Seq(
        "price_positive" -> ($"price" > 0),
        "status_in_domain" -> $"status".isin("O", "F")))
      .select("check_name", "n_rows", "n_violations", "passed")
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (k, n, v, p) => (k, (n, v, p)) }.toMap
    // price: -1 fails, NULL price is a violation too → 2
    assert(got("price_positive") === ((4L, 2L, false)))
    // status: "X" fails, NULL fails → 2
    assert(got("status_in_domain") === ((4L, 2L, false)))
  }

  test("rowChecks: all-pass suite reports passed=true in one scan") {
    val dir = "/tmp/graft_expectations_fixture"
    Seq((1.0), (2.0)).toDF("v").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Expectations.rowChecks(df, Seq(
      "pos" -> ($"v" > 0), "small" -> ($"v" < 100)))
    assert(out.collect().forall(_.getBoolean(3)))
    // ALL checks compute from a single pass: the optimized plan holds
    // exactly one source relation (the AQE executed-plan STRING prints
    // the scan twice — initial + current — so count the logical plan)
    val scans = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.length
    assert(scans === 1)
  }

  test("uniqueness flags duplicate keys; composite keys supported") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "s")
    val single = Expectations.uniqueness(df, "k_unique", Seq("k")).collect().head
    assert(single.getLong(2) === 1L && !single.getBoolean(3))
    val composite = Expectations.uniqueness(df, "ks_unique", Seq("k", "s"))
      .collect().head
    assert(composite.getLong(2) === 1L)
    val ok = Expectations.uniqueness(df.dropDuplicates(), "u", Seq("k", "s"))
      .collect().head
    assert(ok.getLong(2) === 0L && ok.getBoolean(3))
  }

  test("referential counts orphans; NULL foreign keys are orphans") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val got = Expectations.referential(fact, "fk_ok", "fk", dim, "pk")
      .collect().head
    assert(got.getLong(1) === 4L)      // n_rows
    assert(got.getLong(2) === 2L)      // 9 and NULL
    assert(!got.getBoolean(3))
  }
}
