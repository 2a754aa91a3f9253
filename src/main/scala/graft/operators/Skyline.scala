package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — rows not STRICTLY dominated when both
  * dimensions are maximized: no other row is ≥ in both and > in at least
  * one (Börzsönyi, Kossmann & Stocker, "The Skyline Operator", ICDE'01).
  *
  * The naive formulation is an all-pairs NOT EXISTS (the oracle runs
  * exactly that, a genuinely different algorithm). The engine instead
  * uses the 2-D structure: a row (x, y) survives iff
  *
  *   y = M₂(x)   — best y among rows with the SAME x — and
  *   y > M₁(x)   — best y among rows with STRICTLY GREATER x
  *
  * (rows tied on both coordinates never dominate each other, so whole
  * duplicate points survive together). M₂ is one map-side-combining hash
  * agg; M₁ is a prefix max over the DISTINCT-x relation — |domain| rows,
  * not |data| rows, the same trick (and the same caveat) as
  * [[GlobalRank.rankDist]]: for a huge x-domain, range-repartition with
  * broadcast partition maxima instead (two-pass prefix, Packing-style).
  * The join back is a plain shuffle join on x.
  *
  * All comparisons are on caller-provided orderable columns; use exact
  * types (cents, dates, longs) for cross-engine determinism. NULLs in
  * either dimension are a precondition violation (SQL comparisons never
  * match them) — filter first.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val reserved = Seq("__sky_m1", "__sky_m2")
    require(!df.columns.exists(reserved.contains),
      s"input must not use the reserved column names ${reserved.mkString(", ")}")
    val m2 = df.groupBy(xCol).agg(max(yCol).as("__sky_m2"))
    // prefix max over distinct x, descending: everything strictly above x
    val w = Window.orderBy(col(xCol).desc).rowsBetween(Window.unboundedPreceding, -1)
    val dist = m2.withColumn("__sky_m1", max(col("__sky_m2")).over(w))
    df.join(dist, xCol)
      .filter(col(yCol) === col("__sky_m2") &&
        (col("__sky_m1").isNull || col(yCol) > col("__sky_m1")))
      .select(df.columns.map(col): _*) // restore caller column order
  }
}
