package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("hashSamplePerGroup: k per group, deterministic across runs") {
    val emb = Tables.embeddings(spark, sfDir)
    val s1 = Sampling.hashSamplePerGroup(emb, "label", "vec_id", 3)
      .select("label", "vec_id").as[(Int, Long)].collect().toSet
    val s2 = Sampling.hashSamplePerGroup(emb, "label", "vec_id", 3)
      .select("label", "vec_id").as[(Int, Long)].collect().toSet
    assert(s1 === s2)
    val perGroup = s1.groupBy(_._1).view.mapValues(_.size)
    assert(perGroup.values.forall(_ <= 3))
    assert(perGroup.keySet.size === 10) // labels 0..9 all present
  }

  test("BottomKSample aggregator: uniform deterministic k-sample per group") {
    val agg = new Sampling.BottomKSample(5).toColumn
    val ds = Tables.embeddings(spark, sfDir)
      .select($"label", $"vec_id").as[(Int, Long)]
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sample")).collect().toMap
    assert(got.size === 10)
    got.values.foreach { s =>
      assert(s.length === 5)
      assert(s.toSeq === s.toSeq.sorted)
    }
    // deterministic under repartitioning (merge-order independence)
    val got2 = Tables.embeddings(spark, sfDir).repartition(17)
      .select($"label", $"vec_id").as[(Int, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sample")).collect().toMap
    assert(got.view.mapValues(_.toSeq).toMap === got2.view.mapValues(_.toSeq).toMap)
  }

  test("hash sample matches a fraction-free population subset") {
    val emb = Tables.embeddings(spark, sfDir)
    val sampled = Sampling.hashSamplePerGroup(emb, "label", "vec_id", 10)
    // sampled rows are actual source rows (projection-free subset)
    assert(sampled.join(emb, Seq("vec_id"), "left_anti").count() === 0)
  }
}
