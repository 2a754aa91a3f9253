package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.pipeline.Splits

class SplitsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("near-duplicates land in the same split; assignment is deterministic") {
    val base = "the data pipeline reads parquet files and aggregates daily " +
      "metrics for every customer region then writes results back to storage " +
      "with a clean schema and stable partitioning for downstream consumers"
    val fixture = Seq(
      (1L, base),
      (2L, base.replace("daily", "weekly")),      // near dup of 1
      (3L, base.replace("customer", "supplier")), // near dup of 1 → chain
      (10L, "completely different content about cooking pasta with tomato " +
        "sauce and fresh basil leaves in a large copper pot on a warm evening"))
      .toDF("doc_id", "text")
    val out = Splits.leakageSafeSplit(fixture).cache()
    assert(out.count() === 4)
    // one cluster for the chain, so exactly one split value across 1/2/3
    val chainSplits = out.filter(col("doc_id").isin(1L, 2L, 3L))
      .select("split").distinct().as[String].collect()
    assert(chainSplits.length === 1)
    val again = Splits.leakageSafeSplit(fixture)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("fixture corpus: total partition, cluster-constant splits, sane mix") {
    val docs = Tables.documents(spark, sfDir)
    val out = Splits.leakageSafeSplit(docs).cache()
    assert(out.count() === docs.count())
    // every cluster maps to exactly one split
    assert(out.groupBy("cluster_id")
      .agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count() === 0)
    // all three buckets are populated and train dominates
    val mix = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(mix.keySet === Set("train", "val", "test"))
    assert(mix("train") > mix("val") && mix("train") > mix("test"))
    out.unpersist()
  }

  test("invalid percentages are rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(docs, trainPct = 90, valPct = 10)
    }
  }
}
