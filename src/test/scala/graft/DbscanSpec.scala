package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.similarity.Dbscan

/** DBSCAN invariants: role classification, cluster labelling, noise,
  * and determinism under repartitioning.
  */
class DbscanSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("dense blob cores cluster together; isolated vector is noise") {
    // 5 near-identical vectors (a dense blob) + 1 orthogonal outlier
    def vec(base: Float, jitter: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) base + jitter else if (i == 1) 1.0f else 0.0f)
    val rows = (1L to 5L).map(id => (id, vec(1.0f, id * 0.001f), 0)) :+
      (99L, Array.tabulate(64)(i => if (i == 63) 1.0f else 0.0f), 1)
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Dbscan.dbscan(df, eps = 0.9, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    (1L to 5L).foreach { id =>
      assert(out(id)._1 === "core", s"$id: ${out(id)}")
      assert(out(id)._2 === 1L, s"all blob members carry the min id: ${out(id)}")
    }
    assert(out(99L) === (("noise", -1L)))
  }

  test("border points attach to the minimum neighboring cluster") {
    // two cores (mutually similar + each other), one point similar to
    // only one core -> border; minPts=2 makes pairs enough for cores
    val rows = Seq(
      (1L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0f), 0),
      (2L, Array.tabulate(64)(i => if (i == 0) 1.0f else if (i == 1) 0.05f else 0f), 0),
      (3L, Array.tabulate(64)(i => if (i == 0) 0.4f else if (i == 1) 1.0f else 0f), 0)
    )
    val out = Dbscan.dbscan(rows.toDF("vec_id", "embedding", "label"),
      eps = 0.9, minPts = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 and 2 are mutual neighbors but only have one neighbor each
    // (+self = 2 < minPts 3) -> no cores at all -> everything noise
    assert(out.values.forall(_ == "noise"), out.toString)
  }

  test("fixture run: roles partition the corpus, labelling is partition-invariant") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Dbscan.dbscan(emb).collect()
    assert(a.length === emb.count())
    a.foreach {
      case Row(_, "noise", cl) => assert(cl == null)
      case Row(_, role, cl) =>
        assert(role == "core" || role == "border"); assert(cl != null)
    }
    spark.catalog.clearCache()
    val b = Dbscan.dbscan(emb.repartition(11))
    val aDf = spark.createDataFrame(
      spark.sparkContext.parallelize(a.toSeq), b.schema)
    assert(b.exceptAll(aDf).isEmpty && aDf.exceptAll(b).isEmpty)
    spark.catalog.clearCache()
  }
}
