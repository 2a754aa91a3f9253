package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-free truss invariant (dev probe TrussInvariant) asserted on
  * the sf0.01 fixture — the same checker that certifies the sf1.0 scale
  * fixture where the full DuckDB oracle is infeasible (round-12 verdict
  * #4). The independent support recomputation uses the id-ordered triple
  * self-join, NOT the engine's degree-oriented iterator, so this is a
  * genuine differential, not self-certification.
  */
class TrussInvariantSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("converged 4-truss: independent support matches and every edge has >= 2 triangles") {
    val conv = SparkEntry.queries("q_ktruss_converged")(spark, sfDir)
    val (n, mn, bad) = graft.dev.TrussInvariant.check(conv)
    assert(bad === 0L, s"support mismatches vs independent enumeration: $bad")
    assert(n === 0L || mn >= 2L,
      s"converged truss has an edge below threshold (min independent support $mn)")
    assert(n > 0L, "fixture should produce a non-empty 4-truss")
  }

  test("bounded k-truss: published support equals the independent enumeration") {
    val bounded = SparkEntry.queries("q_ktruss")(spark, sfDir)
    val (_, _, bad) = graft.dev.TrussInvariant.check(bounded)
    assert(bad === 0L, s"support mismatches vs independent enumeration: $bad")
  }
}
