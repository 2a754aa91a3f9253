package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Drift
import graft.operators.Sampling
import graft.text.TextOps

/** Filter-cascade attrition audit, token-budget sampler, and KS drift:
  * planted corpora with hand-computable answers plus the structural
  * invariants each operator promises.
  */
class FunnelDriftSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, text: String, source: String = "src0") =
    (id, text, "en", source, text.length.toLong)

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("filterFunnel: planted single-rule failures attribute marginally") {
    val longText = ("the quick brown fox jumps over it " * 20).trim // passes all
    val shortChars = "the a of to in is and for on it be"           // < 150 chars, rest pass? (tokens < 40 too)
    val noStops = ("zzz qqq www eee rrr ttt yyy uuu iii ooo " * 10).trim // fails only stopwords
    val rows = Seq(
      doc(1, longText),   // passes every rule
      doc(2, noStops),    // fails ONLY stop_ge_5pct (>=150 chars, >=40 tokens, no punct)
      doc(3, shortChars)  // fails len AND tok -> marginal nowhere
    ).toDF(cols: _*)
    val out = TextOps.filterFunnel(rows)
      .orderBy("stage")
      .select("rule", "n_enter", "n_killed_here", "n_fail_total", "n_marginal")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq ===
      Seq("len_ge_150", "tok_ge_40", "punct_le_10pct", "stop_ge_5pct"))
    // cascade bookkeeping: n_enter chains through killed counts
    assert(out(0)._2 === 3)
    for (i <- 1 until 4) assert(out(i)._2 === out(i - 1)._2 - out(i - 1)._3)
    // doc 3 dies at stage 1; doc 2 survives to stage 4 and dies there
    assert(out(0)._3 === 1 && out(3)._3 === 1)
    // doc 3 fails two rules -> marginal only counts doc 2 at stage 4
    assert(out(0)._5 === 0 && out(3)._5 === 1)
    // survivors = 1 (doc 1)
    assert(out(3)._2 - out(3)._3 === 1)
    // marginal never exceeds total failures
    out.foreach { r => assert(r._5 <= r._4) }
  }

  test("tokenBudgetSample: prior stays under budget, cum_tokens exact, deterministic") {
    // 6 docs of 30 tokens each per source: budget 100 keeps exactly 4
    // (priors 0/30/60/90 < 100, the 5th has prior 120)
    val text30 = (1 to 30).map(i => s"w$i").mkString(" ")
    val rows = (for (s <- Seq("src0", "src1"); i <- 0 until 6)
      yield doc(s.hashCode.toLong.abs % 97 * 10 + i, text30, s)).toDF(cols: _*)
    val out = Sampling.tokenBudgetSample(rows, budget = 100)
      .as[(Long, String, Long, Long)].collect()
    val bySrc = out.groupBy(_._2)
    assert(bySrc.keySet === Set("src0", "src1"))
    bySrc.values.foreach { docs =>
      assert(docs.length === 4, s"expected 4 kept, got ${docs.length}")
      // cum_tokens are the inclusive multiples of 30 in tape order
      assert(docs.map(_._4).sorted.toSeq === Seq(30L, 60L, 90L, 120L))
    }
    // identical selection under a different input partitioning
    val again = Sampling.tokenBudgetSample(rows.repartition(7), budget = 100)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(again === out.toSet)
  }

  test("ksDrift: identical halves score 0, disjoint halves score 1") {
    // identical n_chars distributions in src0 (A) and src1 (B)
    val same = (for (s <- Seq("src0", "src1"); i <- 0 until 10)
      yield (s.hashCode.toLong.abs % 97 * 100 + i, "x" * (50 + i % 5), "en", s,
        (50 + i % 5).toLong)).toDF(cols: _*)
    val ks0 = Drift.ksDrift(same).select("ks_stat").as[Double].head()
    assert(ks0 === 0.0)
    // disjoint supports: every A value below every B value -> D = 1 at A's max
    val apart = ((0 until 10).map(i => (i.toLong, "a", "en", "src0", (10 + i).toLong)) ++
      (0 until 10).map(i => (100L + i, "b", "en", "src1", (1000 + i).toLong)))
      .toDF(cols: _*)
    val r = Drift.ksDrift(apart)
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((10L, 10L, 19L, 1.0)))
  }
}
