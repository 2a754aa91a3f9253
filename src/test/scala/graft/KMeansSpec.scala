package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.similarity.Ann

class KMeansSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding").withColumn("label", lit("x"))

  test("separable clusters are recovered regardless of seed placement") {
    // two tight blobs far apart in 4-d; any seeding + 3 rounds must split them
    val blobA = (1L to 10L).map(i => i -> Seq(10f + i * 0.01f, 10f, 10f, 10f))
    val blobB = (11L to 20L).map(i => i -> Seq(-10f - i * 0.01f, -10f, -10f, -10f))
    val out = Ann.kmeansAssign(emb(blobA ++ blobB: _*), k = 2, iters = 3)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    val aCids = (1L to 10L).map(out).toSet
    val bCids = (11L to 20L).map(out).toSet
    assert(aCids.size === 1 && bCids.size === 1 && aCids != bCids)
    spark.catalog.clearCache()
  }

  test("training reduces total within-cluster distance on the fixture") {
    val e = Tables.embeddings(spark, sfDir)
    val d0 = Ann.kmeansAssign(e, k = 4, iters = 0).agg(sum("dist")).as[Double].head()
    spark.catalog.clearCache()
    val d2 = Ann.kmeansAssign(e, k = 4, iters = 2).agg(sum("dist")).as[Double].head()
    spark.catalog.clearCache()
    assert(d2 <= d0 + 1e-6, s"Lloyd must not increase cost: $d0 -> $d2")
    assert(d2 < d0, "two rounds should strictly improve on this fixture")
  }

  test("assignment is deterministic under repartitioning") {
    val e = Tables.embeddings(spark, sfDir)
    val a = Ann.kmeansAssign(e, k = 3, iters = 1)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    spark.catalog.clearCache()
    val b = Ann.kmeansAssign(e.repartition(13), k = 3, iters = 1)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    spark.catalog.clearCache()
    assert(a === b)
  }

  test("empty clusters keep their previous centroid (k > distinct points)") {
    val degenerate = emb((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 0f)))
    val out = Ann.kmeansAssign(degenerate, k = 3, iters = 2)
      .select("vec_id", "cid").as[(Long, Int)].collect()
    assert(out.length === 3)
    // all points identical → all land on one cid, the other seeds starve
    assert(out.map(_._2).toSet.size === 1)
    spark.catalog.clearCache()
  }

  test("silhouette: tight far blobs score near 1; one blob split scores low") {
    val blobA = (1L to 10L).map(i => i -> Seq(10f + i * 0.001f, 10f, 10f, 10f))
    val blobB = (11L to 20L).map(i => i -> Seq(-10f - i * 0.001f, -10f, -10f, -10f))
    val good = Ann.kmeansSilhouette(emb(blobA ++ blobB: _*), k = 2, iters = 3)
      .collect()
    assert(good.length == 2)
    good.foreach { r =>
      assert(r.getLong(1) == 10L)
      assert(r.getLong(2) > 990000L, s"tight separated blobs: ${r.getLong(2)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // k=4 over the same 2 true blobs: some cluster must score much lower
    val split = Ann.kmeansSilhouette(emb(blobA ++ blobB: _*), k = 4, iters = 3)
      .collect().map(_.getLong(2))
    assert(split.min < 900000L)
    spark.catalog.clearCache()
  }
}
