package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.CosinePairs
import graft.io.Tables

/** AllPairs cosine join: differential check against a brute-force
  * full self-join (no prefix filter) at several thresholds — the prefix
  * filter must be invisible in the result — plus bound sanity and plan
  * shape (candidate generation must be an equi-join, no cartesian).
  */
class CosinePairsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  /** Brute-force reference: identical fixed-point weighting, full
    * feature self-join, no prefix pruning.
    */
  private def brute(threshold: Double) = {
    val tPico = math.round(threshold * 1e12)
    val toks = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("doc_id"), lower(col("raw")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Base60(col("token")).as("hv"), col("tf"))
    val dfreq = tf.groupBy("hv").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val wp = tf.join(dfreq, "hv").crossJoin(broadcast(n))
      .select(col("doc_id"), col("hv"),
        floor(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")) * 1e6 + 0.5)
          .cast("long").as("w_micro"))
      .filter(col("w_micro") > 0)
    val norms = wp.groupBy("doc_id").agg(sum(col("w_micro") * col("w_micro")).as("norm2"))
    val fp = wp.join(norms, "doc_id")
      .select(col("doc_id"), col("hv"),
        floor(col("w_micro").cast("double") * 1e6 /
          sqrt(col("norm2").cast("double")) + 0.5).cast("long").as("wn"))
      .filter(col("wn") > 0)
    fp.as("a").join(fp.as("b"),
        col("a.hv") === col("b.hv") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wn") * col("b.wn")).as("dot_pico"))
      .filter(col("dot_pico") >= tPico)
      .select(col("doc_a"), col("doc_b"),
        (col("dot_pico").cast("double") / 1e12).as("cosine"))
  }

  test("cosinePairs equals the brute-force full join at t=0.9 and t=0.7") {
    for (t <- Seq(0.9, 0.7)) {
      val fast = CosinePairs.cosinePairs(docs, t)
      val ref = brute(t)
      assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
        s"prefix-filtered result diverges from brute force at t=$t")
      spark.catalog.clearCache()
    }
  }

  test("cosine values are valid and pairs are ordered") {
    val out = CosinePairs.cosinePairs(docs, 0.7).collect()
    assert(out.nonEmpty, "fixture should contain near-dup template docs")
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getDouble(2)
      // micro-rounding can push a hair past 1.0 on identical docs
      assert(c >= 0.7 && c <= 1.0 + 1e-4, s"cosine out of range: $c")
    }
    spark.catalog.clearCache()
  }

  test("identical documents score cosine ~1.0") {
    val two = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now yes")
    ).toDF("doc_id", "text")
    val out = CosinePairs.cosinePairs(two, 0.9).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 2L)
    assert(math.abs(out.head.getDouble(2) - 1.0) < 1e-4)
    spark.catalog.clearCache()
  }

  test("plan: candidate generation is an equi-join, never a cartesian") {
    val plan = CosinePairs.cosinePairs(docs, 0.9).queryExecution.executedPlan.toString
    // the only nested-loop joins allowed are the 1-row n_docs scalar
    // crosses (the corpus-size constant, same idiom as tfidf); any
    // Inner-typed nested loop or cartesian means candidate generation
    // degenerated to all-pairs
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs product leaked into the plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin BuildRight, Inner") &&
      !plan.contains("BroadcastNestedLoopJoin BuildLeft, Inner"),
      s"non-scalar nested-loop join leaked into the plan:\n$plan")
    spark.catalog.clearCache()
  }

  test("shuffled-hash verify tier (100 TB path) matches the default tier") {
    // force the largest tier: vectors "too big to broadcast" → the
    // verify joins must become shuffled-hash (streaming, no sort of the
    // pair+vector rows) and produce the identical result set
    val shj = CosinePairs.cosinePairs(docs, 0.9, 0L, 0L)
    val plan = shj.queryExecution.executedPlan.toString
    // both verify joins (pair keys doc_a / doc_b) must be shuffled-hash;
    // the doc_id-keyed joins inside the cached feature build may stay
    // sort-merge (per-doc bounded rows, built once, cached)
    assert(plan.contains("ShuffledHashJoin [doc_a") &&
      plan.contains("ShuffledHashJoin [doc_b"),
      s"forced tier did not plan shuffled-hash verify joins:\n$plan")
    assert(!plan.contains("SortMergeJoin [doc_a") &&
      !plan.contains("SortMergeJoin [doc_b"),
      s"verify join fell back to sort-merge (would sort the pair+vector stream):\n$plan")
    val ref = CosinePairs.cosinePairs(docs, 0.9)
    assert(shj.exceptAll(ref).isEmpty && ref.exceptAll(shj).isEmpty,
      "shuffled-hash tier diverges from the default tier")
    spark.catalog.clearCache()
  }

  test("measured-broadcast verify tier matches the default tier") {
    // force the middle tier (smallBytes=0 so the deliberate broadcast
    // hint path runs even on the tiny fixture)
    val bc = CosinePairs.cosinePairs(docs, 0.9, 0L, Long.MaxValue)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"broadcast tier did not plan BHJ verify joins:\n$plan")
    val ref = CosinePairs.cosinePairs(docs, 0.9)
    assert(bc.exceptAll(ref).isEmpty && ref.exceptAll(bc).isEmpty,
      "broadcast tier diverges from the default tier")
    spark.catalog.clearCache()
  }

  test("degenerate corpora return empty, not NPE") {
    // all-duplicates: every token appears in every doc, df == N, every
    // idf-0 weight filters out — the feature relation is EMPTY and the
    // corpus-max-norm scalar is a NULL row. Exactly the input a dedup
    // pipeline sees on a fully templated shard.
    val dup = (1L to 6L).map(i => (i, "same exact words every time"))
      .toDF("doc_id", "text")
    assert(CosinePairs.cosinePairs(dup, 0.9).isEmpty)
    // empty corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CosinePairs.cosinePairs(empty, 0.9).isEmpty)
    spark.catalog.clearCache()
  }
}
