package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.pipeline.Retrieval

/** RRF hybrid retrieval: fused scores recompute exactly from the two
  * systems' ranks, and membership flags reflect the candidate lists.
  */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("hybridTopK: rrf_micro recomputes from the per-system ranks") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val fused = Retrieval.hybridTopK(docs, emb, k = 10, perSystem = 20)
      .collect()
    assert(fused.nonEmpty)
    val lex = graft.text.Bm25.topK(docs, 20, 10)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    val dense = graft.similarity.Ann.bruteForceTopK(emb, 20, 10)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    fused.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      val want = lex.get((q, d)).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        dense.get((q, d)).map(rk => 1000000L / (60 + rk)).getOrElse(0L)
      assert(r.getLong(2) === want, s"rrf mismatch for ($q,$d)")
      assert(r.getBoolean(3) === lex.contains((q, d)))
      assert(r.getBoolean(4) === dense.contains((q, d)))
    }
    // every query returns k rows, ranks 1..k, scores non-increasing
    fused.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq === (1 to sorted.length))
      assert(sorted.sliding(2).forall(w =>
        w.length < 2 || w(0).getLong(2) >= w(1).getLong(2)))
    }
    spark.catalog.clearCache()
  }

  test("hybridTopK: a doc topping both systems tops the fusion") {
    // build a corpus where doc 50 is doc 0's text twin AND vector twin
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val d0text = docs.filter($"doc_id" === 0).select("text").as[String].head()
    val d0vec = emb.filter($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val docs2 = docs.withColumn("text",
      when($"doc_id" === 50, lit(d0text)).otherwise($"text"))
    val emb2 = emb.withColumn("embedding",
      when($"vec_id" === 50, lit(d0vec)).otherwise($"embedding"))
    val top = Retrieval.hybridTopK(docs2, emb2, k = 3, perSystem = 20)
      .filter($"query_id" === 0 && $"rank" === 1)
      .select("doc_id", "in_lexical", "in_dense")
      .as[(Long, Boolean, Boolean)].head()
    assert(top === ((50L, true, true)))
    spark.catalog.clearCache()
  }
}
