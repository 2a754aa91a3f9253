package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Kmv

/** KMV / theta-sketch estimator contract: exact-below-k behavior,
  * theta-intersection correctness on planted overlaps, and the
  * estimator's scale-invariant determinism (the bit-exact DuckDB replay
  * is the driver's oracle check; these pin the semantics).
  */
class KmvSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def pairs(a: Seq[Long], b: Seq[Long]) =
    (a.map(("A", _)) ++ b.map(("B", _))).toDF("grp", "id")

  test("sets smaller than k are estimated exactly (sketch = set)") {
    val df = pairs(1L to 20L, 11L to 30L) // overlap 11..20
    val r = Kmv.kmvCompare(df, "A", "B", k = 64).head()
    assert(r.getAs[Long]("n_a") === 20L)
    assert(r.getAs[Long]("n_b") === 20L)
    assert(r.getAs[Long]("n_union") === 30L)
    assert(r.getAs[Long]("n_inter") === 10L)
    // below k the sketch IS the set: estimates are exact in micro units
    assert(r.getAs[Long]("est_a_micro") === 20L * 1000000L)
    assert(r.getAs[Long]("est_b_micro") === 20L * 1000000L)
    assert(r.getAs[Long]("est_union_micro") === 30L * 1000000L)
    assert(r.getAs[Long]("est_inter_micro") === 10L * 1000000L)
    // Jaccard 10/30 in integral micro division
    assert(r.getAs[Long]("jaccard_est_micro") === 1000000L / 3L)
  }

  test("disjoint sets: zero intersection estimate, union adds") {
    val r = Kmv.kmvCompare(pairs(1L to 15L, 100L to 114L), "A", "B", k = 64)
      .head()
    assert(r.getAs[Long]("n_inter") === 0L)
    assert(r.getAs[Long]("est_inter_micro") === 0L)
    assert(r.getAs[Long]("est_union_micro") === 30L * 1000000L)
    assert(r.getAs[Long]("jaccard_est_micro") === 0L)
  }

  test("above k: estimate within 4 rse of the truth, identical across partitionings") {
    val df = pairs(1L to 2000L, 1001L to 3000L)
    val r = Kmv.kmvCompare(df, "A", "B", k = 64).head()
    val rse = 1.0 / math.sqrt(62.0) // (k-2)^-1/2 for the KMV estimator
    def within(est: Long, truth: Double): Boolean =
      math.abs(est / 1e6 - truth) <= 4 * rse * truth
    assert(within(r.getAs[Long]("est_a_micro"), 2000.0),
      s"est_a=${r.getAs[Long]("est_a_micro")}")
    assert(within(r.getAs[Long]("est_union_micro"), 3000.0),
      s"est_u=${r.getAs[Long]("est_union_micro")}")
    // determinism under a different physical layout
    val r2 = Kmv.kmvCompare(df.repartition(7), "A", "B", k = 64).head()
    assert(r.toSeq === r2.toSeq)
    spark.catalog.clearCache()
  }
}
